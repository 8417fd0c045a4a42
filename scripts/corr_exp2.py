"""Ablation harness for the volume-cache EXTRACTION kernel
(pallas_corr._extract_kernel) at the compact-regime tracking shapes.

The per-frame device program spends ~25 ms in 6 corr extractions
(round-4 BENCH trace); the extraction's HBM floor (re-reading the
(E, HWp, H_l, LANE) bf16 volumes once per extraction) is ~1.8 ms, so
the measured ~4.2 ms/extraction has ~2.4x of kernel overhead to
recover. Knobs probed here:

  * volume cast: f32 upcast before the A_y matmul (current) vs
    feeding bf16 operands straight to the MXU;
  * selector dtype: f32 (current) vs bf16 A_y/B_x;
  * blk: 128 / 256 / 512 queries per program.

Usage: python scripts/corr_exp2.py [E [H W]]
"""

import functools
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from scripts.kbench import device_time_ms  # noqa: E402
from pvo_tpu.vo.net.pallas_corr import (  # noqa: E402
    LANE, PATCH, RADIUS, SHIFT, TAPS, _shift_bank, build_corr_volumes,
    corr_level_shapes, pallas_corr_extract)


def _extract_kernel_v(c_ref, r_ref, *refs, shapes, blk, cast_vol,
                      sel_dtype):
    n_lvl = len(shapes)
    vol_refs = refs[:n_lvl]
    out_ref = refs[n_lvl]

    coords = c_ref[0].astype(jnp.float32)
    R = r_ref[...].astype(sel_dtype)
    ii = jax.lax.broadcasted_iota(jnp.int32, (blk, LANE), 1)

    def _sel(p, frac):
        p0 = p.astype(jnp.int32)[:, None] - RADIUS + SHIFT
        f = frac[:, None].astype(sel_dtype)
        Q = ((ii == p0).astype(sel_dtype) * (1 - f) +
             (ii == p0 + 1).astype(sel_dtype) * f)
        return jax.lax.dot_general(
            Q, R, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32
        ).reshape(blk, PATCH, LANE).astype(sel_dtype)

    for l, (H_l, W_l, _n_t, _m_t) in enumerate(shapes):
        corr3 = vol_refs[l][0]
        if cast_vol:
            corr3 = corr3.astype(jnp.float32)

        cl = coords * jnp.float32(0.5 ** l)
        x, y = cl[:, 0], cl[:, 1]
        bx = jnp.floor(x)
        by = jnp.floor(y)

        A_y = _sel(by, y - by)[:, :, :H_l]
        B_x = _sel(bx, x - bx)
        if not cast_vol:
            A_y = A_y.astype(corr3.dtype)
            B_x = B_x.astype(corr3.dtype)

        tmp = jax.lax.dot_general(
            A_y, corr3,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        if not cast_vol:
            tmp = tmp.astype(corr3.dtype)
        patch = jax.lax.dot_general(
            tmp, B_x,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        patch = patch.astype(out_ref.dtype)

        for dy in range(PATCH):
            base = l * TAPS + dy * PATCH
            out_ref[0, :, base:base + PATCH] = patch[:, dy, :]


def extract_v(vols, shapes, coords, blk, cast_vol, sel_dtype):
    E, H, W, _ = coords.shape
    HW = H * W
    HWp0 = vols[0].shape[1]
    num_levels = len(shapes)

    cfl = coords.reshape(E, HW, 2)
    if HWp0 != HW:
        cfl = jnp.concatenate(
            [cfl, jnp.zeros((E, HWp0 - HW, 2), cfl.dtype)], axis=1)
    nb = HWp0 // blk

    out_ch = num_levels * TAPS
    in_specs = [
        pl.BlockSpec((1, blk, 2), lambda e, b: (e, b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((LANE, PATCH * LANE), lambda e, b: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    for (H_l, _, _n, _m) in shapes:
        in_specs.append(pl.BlockSpec(
            (1, blk, H_l, LANE), lambda e, b: (e, b, 0, 0),
            memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        functools.partial(_extract_kernel_v, shapes=tuple(shapes),
                          blk=blk, cast_vol=cast_vol,
                          sel_dtype=sel_dtype),
        out_shape=jax.ShapeDtypeStruct((E, HWp0, out_ch), jnp.bfloat16),
        grid=(E, nb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, blk, out_ch),
                               lambda e, b: (e, b, 0),
                               memory_space=pltpu.VMEM),
    )(cfl, _shift_bank(), *vols)
    return out


def main():
    E = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 101

    rng = np.random.RandomState(0)
    C = 128
    f1 = jnp.asarray(rng.randn(E, H, W, C), jnp.bfloat16)
    f2 = jnp.asarray(rng.randn(E, H, W, C), jnp.bfloat16)
    coords = jnp.asarray(
        rng.rand(E, H, W, 2) * np.array([W - 1, H - 1]), jnp.float32)

    vols, shapes = build_corr_volumes(f1, f2)
    vshapes = corr_level_shapes(H, W)
    jax.block_until_ready(vols)
    vol_mb = sum(int(np.prod(v.shape)) * 2 for v in vols) / 1e6
    print(f"E={E} {H}x{W}: volume {vol_mb:.1f} MB bf16 "
          f"(HBM floor ~{vol_mb / 819:.2f} ms/extract)")

    base = jax.jit(lambda v, c: pallas_corr_extract(
        v, vshapes, c, packed=True))
    ms = device_time_ms(lambda: base(vols, coords), top=0)
    print(f"current extract:                {ms:.3f} ms")

    ref = np.asarray(base(vols, coords), np.float32)
    for blk in (128, 256, 512):
        for cast_vol in (True, False):
            for sd in (jnp.float32, jnp.bfloat16):
                tag = (f"blk={blk:<3} cast={int(cast_vol)} "
                       f"sel={jnp.dtype(sd).name:<8}")
                try:
                    fn = jax.jit(lambda v, c, b=blk, cv=cast_vol,
                                 s=sd: extract_v(v, vshapes, c, b,
                                                 cv, s))
                    HW = H * W
                    got = np.asarray(fn(vols, coords),
                                     np.float32)[:, :HW]
                    got = got.reshape(ref.shape)
                    err = float(np.abs(got - ref).max())
                    ms = device_time_ms(lambda: fn(vols, coords),
                                        top=0)
                    print(f"{tag}: {ms:.3f} ms  max|d|={err:.4f}")
                except Exception as e:  # noqa: BLE001
                    print(f"{tag}: FAIL {type(e).__name__}: "
                          f"{str(e)[:120]}")


if __name__ == "__main__":
    main()
