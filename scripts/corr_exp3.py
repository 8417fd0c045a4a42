"""Diagnostic variants for the extraction kernel: isolate where the
~8.9 ms standalone extraction (1.38 GB volume, ~1.7 ms HBM floor)
actually goes — DMA, selector matmuls, batched A@V@B, or the 32 narrow
8-lane output stores per block.

Variants (speed-only; outputs are intentionally wrong for B/C/D):
  full   — the real kernel (baseline)
  nostore— all compute, single dummy store per level
  novab  — DMA + selectors only, store selector slice
  dma    — pure volume DMA: store a reduced copy

Usage: python scripts/corr_exp3.py [E [H W]]
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
    corr_level_shapes)


def _kern(c_ref, r_ref, *refs, shapes, blk, mode):
    n_lvl = len(shapes)
    vol_refs = refs[:n_lvl]
    out_ref = refs[n_lvl]

    coords = c_ref[0].astype(jnp.float32)
    R = r_ref[...]
    ii = jax.lax.broadcasted_iota(jnp.int32, (blk, LANE), 1)

    def _sel(p, frac):
        p0 = p.astype(jnp.int32)[:, None] - RADIUS + SHIFT
        f = frac[:, None]
        Q = ((ii == p0).astype(jnp.float32) * (1.0 - f) +
             (ii == p0 + 1).astype(jnp.float32) * f)
        return jax.lax.dot_general(
            Q, R, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32
        ).reshape(blk, PATCH, LANE)

    for l, (H_l, W_l, _n_t, _m_t) in enumerate(shapes):
        corr3 = vol_refs[l][0].astype(jnp.float32)

        if mode == "dma":
            # pure read cost: touch every element once, one wide store
            red = jnp.sum(corr3, axis=1)          # (BLK, LANE)
            out_ref[0, :, 0:LANE] = red.astype(out_ref.dtype)
            continue

        cl = coords * jnp.float32(0.5 ** l)
        x, y = cl[:, 0], cl[:, 1]
        bx = jnp.floor(x)
        by = jnp.floor(y)

        A_y = _sel(by, y - by)[:, :, :H_l]
        B_x = _sel(bx, x - bx)

        if mode == "novab":
            out_ref[0, :, 0:LANE] = (B_x[:, 0, :] + A_y[:, 0, :1] +
                                     corr3[:, 0, :]).astype(
                out_ref.dtype)
            continue

        tmp = jax.lax.dot_general(
            A_y, corr3,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        patch = jax.lax.dot_general(
            tmp, B_x,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        patch = patch.astype(out_ref.dtype)

        if mode == "nostore":
            out_ref[0, :, l * TAPS:l * TAPS + PATCH] = patch[:, 0, :]
            continue

        for dy in range(PATCH):
            base = l * TAPS + dy * PATCH
            out_ref[0, :, base:base + PATCH] = patch[:, dy, :]


def run_mode(vols, shapes, coords, blk, mode):
    E, H, W, _ = coords.shape
    HW = H * W
    HWp0 = vols[0].shape[1]
    cfl = coords.reshape(E, HW, 2)
    if HWp0 != HW:
        cfl = jnp.concatenate(
            [cfl, jnp.zeros((E, HWp0 - HW, 2), cfl.dtype)], axis=1)
    nb = HWp0 // blk
    out_ch = len(shapes) * TAPS
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
    return pl.pallas_call(
        functools.partial(_kern, shapes=tuple(shapes), blk=blk,
                          mode=mode),
        out_shape=jax.ShapeDtypeStruct((E, HWp0, out_ch), jnp.bfloat16),
        grid=(E, nb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, blk, out_ch),
                               lambda e, b: (e, b, 0),
                               memory_space=pltpu.VMEM),
    )(cfl, _shift_bank(), *vols)


def main():
    E = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 101

    rng = np.random.RandomState(0)
    f1 = jnp.asarray(rng.randn(E, H, W, 128), jnp.bfloat16)
    f2 = jnp.asarray(rng.randn(E, H, W, 128), jnp.bfloat16)
    coords = jnp.asarray(
        rng.rand(E, H, W, 2) * np.array([W - 1, H - 1]), jnp.float32)
    vols, _ = build_corr_volumes(f1, f2)
    vshapes = corr_level_shapes(H, W)
    jax.block_until_ready(vols)

    for mode in ("full", "nostore", "novab", "dma"):
        fn = jax.jit(lambda v, c, m=mode: run_mode(v, vshapes, c,
                                                   256, m))
        fn(vols, coords)
        ms = device_time_ms(lambda: fn(vols, coords), top=0)
        print(f"{mode:8s}: {ms:.3f} ms")


if __name__ == "__main__":
    main()
