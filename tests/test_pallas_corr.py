"""Pallas fused corr lookup vs the XLA reference path (interpret mode
on CPU; the same kernel compiles with Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvo_tpu.vo.net import corr as corr_ops
from pvo_tpu.vo.net.pallas_corr import pallas_corr_lookup

E, H, W, C = 2, 8, 12, 16


@pytest.mark.parametrize("num_levels", [1, 3])
def test_matches_xla_lookup(num_levels):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    f1 = jax.random.normal(k1, (E, H, W, C), jnp.float32)
    f2 = jax.random.normal(k2, (E, H, W, C), jnp.float32)
    coords = jnp.stack([
        jax.random.uniform(k3, (E, H, W), minval=-2.0, maxval=W + 1.0),
        jax.random.uniform(k3, (E, H, W), minval=-2.0, maxval=H + 1.0),
    ], axis=-1)

    ref = corr_ops.lookup(
        corr_ops.build_pyramid(f1, f2, num_levels), coords, radius=3)
    out = pallas_corr_lookup(f1, f2, coords, num_levels=num_levels,
                             blk=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_integer_coords_center_tap():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    f1 = jax.random.normal(k1, (1, H, W, C), jnp.float32)
    f2 = jax.random.normal(k2, (1, H, W, C), jnp.float32)
    from pvo_tpu.geom.projective import coords_grid
    coords = jnp.broadcast_to(coords_grid(H, W), (1, H, W, 2))
    out = pallas_corr_lookup(f1, f2, coords, num_levels=1, blk=32,
                             interpret=True)
    vol = np.einsum("ehwc,eijc->ehwij", np.asarray(f1),
                    np.asarray(f2)) / 16.0
    center = np.asarray(out).reshape(1, H, W, 7, 7)[..., 3, 3]
    diag = np.stack([vol[0, i, j, i, j] for i in range(H)
                     for j in range(W)]).reshape(1, H, W)
    np.testing.assert_allclose(center, diag, rtol=1e-4, atol=1e-5)


def test_packed_layout_matches_expanded_weights():
    """conv(expand_corr_weights(W)) on the PACKED tap layout must equal
    conv(W) on the public (reference-CUDA-ordered) layout — ties the
    dy-major packed store order to the weight expansion mapping."""
    from pvo_tpu.vo.net.pallas_corr import expand_corr_weights

    num_levels = 3
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(2), 4)
    f1 = jax.random.normal(k1, (E, H, W, C), jnp.float32)
    f2 = jax.random.normal(k2, (E, H, W, C), jnp.float32)
    coords = jnp.stack([
        jax.random.uniform(k3, (E, H, W), minval=0.0, maxval=W - 1.0),
        jax.random.uniform(k3, (E, H, W), minval=0.0, maxval=H - 1.0),
    ], axis=-1)

    public = pallas_corr_lookup(f1, f2, coords, num_levels=num_levels,
                                blk=32, interpret=True)
    packed = pallas_corr_lookup(f1, f2, coords, num_levels=num_levels,
                                blk=32, interpret=True, packed=True)

    cin = num_levels * 49
    kernel = jax.random.normal(k4, (1, 1, cin, 8), jnp.float32)
    params = {"params": {"corr_enc0": {"kernel": kernel}}}
    expanded = expand_corr_weights(params, num_levels)
    kexp = expanded["params"]["corr_enc0"]["kernel"]

    out_pub = jnp.einsum("ehwc,co->ehwo", public, kernel[0, 0])
    out_pk = jnp.einsum("ehwc,co->ehwo",
                        packed.astype(jnp.float32), kexp[0, 0])
    np.testing.assert_allclose(np.asarray(out_pk), np.asarray(out_pub),
                               rtol=2e-2, atol=2e-2)


def test_shape_gate(monkeypatch):
    """Admission is bounded by the kernel's estimated VMEM footprint
    (every pyramid level stays fully resident per program): geometries
    beyond the ~16 MB/core budget fall back to the XLA path instead of
    OOMing VMEM (round-3 advisor finding — the old 8-tile count gate
    admitted multi-hundred-MB footprints)."""
    from pvo_tpu.vo import factor_graph as fg
    from pvo_tpu.vo.net.pallas_corr import corr_vmem_bytes

    monkeypatch.setenv("PVO_PALLAS_CORR", "1")
    fg._pallas_backend_ok.cache_clear()
    try:
        assert fg._use_pallas_corr(30, 101)       # tracking (3.4 MB)
        assert fg._use_pallas_corr(30, 121)       # 2 x-tiles (5.3 MB)
        assert fg._use_pallas_corr(47, 156)       # test_vo2 (8.3 MB)
        # y-tiled tall geometries pad rows to 112-row tiles: their
        # footprints exceed VMEM and must take the XLA fallback
        assert corr_vmem_bytes(156, 47) > fg._CORR_VMEM_BUDGET
        assert not fg._use_pallas_corr(156, 47)
        assert not fg._use_pallas_corr(128, 160)
        assert not fg._use_pallas_corr(30, 9000)
        assert not fg._use_pallas_corr(9000, 30)
        assert fg._use_pallas_corr()              # shape-agnostic gate
    finally:
        fg._pallas_backend_ok.cache_clear()


def test_volume_cache_extract_matches_fused():
    """build_corr_volumes + pallas_corr_extract == pallas_corr_lookup
    up to the bf16 volume rounding (the cache stores bf16 volumes,
    like the reference's fp16 CorrBlock)."""
    from pvo_tpu.vo.net.pallas_corr import (build_corr_volumes,
                                            pallas_corr_extract)

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(4), 3)
    f1 = jax.random.normal(k1, (E, H, W, C), jnp.float32)
    f2 = jax.random.normal(k2, (E, H, W, C), jnp.float32)
    coords = jnp.stack([
        jax.random.uniform(k3, (E, H, W), minval=-1.0, maxval=W + 0.5),
        jax.random.uniform(k3, (E, H, W), minval=-1.0, maxval=H + 0.5),
    ], axis=-1)

    fused = pallas_corr_lookup(f1, f2, coords, num_levels=3, blk=32,
                               interpret=True)
    vols, shapes = build_corr_volumes(f1, f2, num_levels=3, blk=32)
    # stacked single buffer, rows 16-aligned for the pipelined DMA
    assert vols.ndim == 4
    assert vols.shape[2] == -(-sum(s[0] for s in shapes) // 16) * 16
    ext = pallas_corr_extract(
        vols, tuple(tuple(s) for s in shapes), coords, blk=32,
        interpret=True)
    np.testing.assert_allclose(np.asarray(ext), np.asarray(fused),
                               rtol=2e-2, atol=2e-2)


def test_wide_stream_x_tiling():
    """Widths beyond the 120-lane bound are handled by x-tiling
    (VERDICT #3): parity vs the XLA path at the test_vo2 export
    width (156 at 1/8 res) including windows straddling the tile
    boundary."""
    Ww = 156
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    f1 = jax.random.normal(k1, (1, H, Ww, C), jnp.float32)
    f2 = jax.random.normal(k2, (1, H, Ww, C), jnp.float32)
    # bias half the coords toward the tile boundary (cols 104..120)
    cx = jnp.concatenate([
        jax.random.uniform(k3, (1, H, Ww // 2), minval=-2.0,
                           maxval=Ww + 1.0),
        jax.random.uniform(k3, (1, H, Ww - Ww // 2), minval=104.0,
                           maxval=120.0)], axis=-1)
    cy = jax.random.uniform(k3, (1, H, Ww), minval=-1.0,
                            maxval=H + 0.5)
    coords = jnp.stack([cx, cy], axis=-1)

    ref = corr_ops.lookup(
        corr_ops.build_pyramid(f1, f2, 4), coords, radius=3)
    out = pallas_corr_lookup(f1, f2, coords, num_levels=4, blk=32,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_width_gate_allows_tiled_widths(monkeypatch):
    from pvo_tpu.vo import factor_graph as fg

    monkeypatch.setenv("PVO_PALLAS_CORR", "1")
    fg._pallas_backend_ok.cache_clear()
    try:
        assert fg._use_pallas_corr(47, 156)   # test_vo2 geometry
        # (30, 500) pads to 5 x-tiles = 13.2 MB > budget -> XLA path
        assert not fg._use_pallas_corr(30, 500)
        assert not fg._use_pallas_corr(30, 9000)
    finally:
        fg._pallas_backend_ok.cache_clear()


def test_tall_stream_y_tiling():
    """Heights beyond the 120-lane bound are handled by y-tiling
    (round-2 VERDICT weak #6): parity vs the XLA path at a
    1024-px-tall geometry (h=128 at 1/8 res) including windows
    straddling the row-tile boundary at y=112."""
    Hh, Wt = 128, 40
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(6), 3)
    f1 = jax.random.normal(k1, (1, Hh, Wt, C), jnp.float32)
    f2 = jax.random.normal(k2, (1, Hh, Wt, C), jnp.float32)
    # bias half the coords toward the row-tile boundary (rows 104..120)
    cy = jnp.concatenate([
        jax.random.uniform(k3, (1, Hh // 2, Wt), minval=-2.0,
                           maxval=Hh + 1.0),
        jax.random.uniform(k3, (1, Hh - Hh // 2, Wt), minval=104.0,
                           maxval=120.0)], axis=1)
    cx = jax.random.uniform(k3, (1, Hh, Wt), minval=-1.0,
                            maxval=Wt + 0.5)
    coords = jnp.stack([cx, cy], axis=-1)

    ref = corr_ops.lookup(
        corr_ops.build_pyramid(f1, f2, 4), coords, radius=3)
    out = pallas_corr_lookup(f1, f2, coords, num_levels=4, blk=32,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_tall_and_wide_stream_xy_tiling():
    """Both axes tiled at once (2x2 tiles)."""
    Hh, Wt = 128, 130
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
    f1 = jax.random.normal(k1, (1, Hh, Wt, C), jnp.float32)
    f2 = jax.random.normal(k2, (1, Hh, Wt, C), jnp.float32)
    coords = jnp.stack([
        jax.random.uniform(k3, (1, Hh, Wt), minval=-2.0,
                           maxval=Wt + 1.0),
        jax.random.uniform(k3, (1, Hh, Wt), minval=-2.0,
                           maxval=Hh + 1.0)], axis=-1)

    ref = corr_ops.lookup(
        corr_ops.build_pyramid(f1, f2, 4), coords, radius=3)
    out = pallas_corr_lookup(f1, f2, coords, num_levels=4, blk=32,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
