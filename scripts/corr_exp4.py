"""Extraction kernel v2 experiment: batched selector construction
(ONE bank matmul for all levels/axes) + flat tap placement via one-hot
matmuls accumulating a single (blk, 256) store (replaces 32 narrow
8-lane stores). Parity-checked against the production extract.

Usage: python scripts/corr_exp4.py [E [H W]]
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
import pvo_tpu.vo.net.pallas_corr as pc  # noqa: E402
from pvo_tpu.vo.net.pallas_corr import (  # noqa: E402
    LANE, PATCH, RADIUS, SHIFT, TAPS, _shift_bank, _vol_offsets,
    corr_level_shapes, pallas_build_volumes, pallas_corr_extract)


def _place_bank(n_lvl, dtype=jnp.float32):
    """(n_lvl*PATCH, PATCH, out_ch) one-hot: row (l*8+dy), P[dx, t]=1
    iff t == l*TAPS + dy*PATCH + dx."""
    out_ch = n_lvl * TAPS
    m = np.zeros((n_lvl * PATCH, PATCH, out_ch), np.float32)
    for l in range(n_lvl):
        for dy in range(PATCH):
            for dx in range(PATCH):
                m[l * PATCH + dy, dx, l * TAPS + dy * PATCH + dx] = 1.0
    return jnp.asarray(m, dtype)


def _extract_kernel_v2(c_ref, r_ref, p_ref, vol_ref, out_ref, *,
                       shapes, blk):
    offs, _ = _vol_offsets(shapes)
    n_lvl = len(shapes)
    coords = c_ref[0].astype(jnp.float32)
    R = r_ref[...]
    vol = vol_ref[0]

    ii = jax.lax.broadcasted_iota(jnp.int32, (blk, LANE), 1)

    def _two_hot(cl, ax):
        p = jnp.floor(cl[:, ax])
        f = (cl[:, ax] - p)[:, None]
        p0 = p.astype(jnp.int32)[:, None] - RADIUS + SHIFT
        return ((ii == p0).astype(jnp.float32) * (1.0 - f) +
                (ii == p0 + 1).astype(jnp.float32) * f)

    acc = jnp.zeros((blk, n_lvl * TAPS), jnp.float32)
    for l, (H_l, W_l, _n_t, _m_t) in enumerate(shapes):
        corr3 = vol[:, offs[l]:offs[l] + H_l, :]
        cl = coords * jnp.float32(0.5 ** l)
        # y and x two-hots share ONE bank matmul per level
        Qp = jnp.concatenate([_two_hot(cl, 1), _two_hot(cl, 0)],
                             axis=0)
        S = jax.lax.dot_general(
            Qp, R, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32
        ).reshape(2, blk, PATCH, LANE)
        A_y = S[0][:, :, :H_l]
        B_x = S[1]
        tmp = jax.lax.dot_general(
            A_y, corr3,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        patch = jax.lax.dot_general(
            tmp, B_x,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)   # (blk, 8dy, 8dx)
        for dy in range(PATCH):
            acc = acc + jax.lax.dot_general(
                patch[:, dy, :], p_ref[l * PATCH + dy],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


def extract_v2(vols, shapes, coords, blk=256):
    E, H, W, _ = coords.shape
    HW = H * W
    HWp = vols.shape[1]
    H_sum = vols.shape[2]
    n_lvl = len(shapes)
    nb = HWp // blk
    cfl = coords.reshape(E, HW, 2)
    if HWp != HW:
        cfl = jnp.concatenate(
            [cfl, jnp.zeros((E, HWp - HW, 2), cfl.dtype)], axis=1)
    out_ch = n_lvl * TAPS
    in_specs = [
        pl.BlockSpec((1, blk, 2), lambda e, b: (e, b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((LANE, PATCH * LANE), lambda e, b: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_lvl * PATCH, PATCH, out_ch),
                     lambda e, b: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk, H_sum, LANE), lambda e, b: (e, b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        functools.partial(_extract_kernel_v2, shapes=tuple(shapes),
                          blk=blk),
        out_shape=jax.ShapeDtypeStruct((E, HWp, out_ch), jnp.bfloat16),
        grid=(E, nb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, blk, out_ch),
                               lambda e, b: (e, b, 0),
                               memory_space=pltpu.VMEM),
    )(cfl, _shift_bank(), _place_bank(n_lvl), vols)


def main():
    E = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 101

    rng = np.random.RandomState(0)
    f1 = jnp.asarray(rng.randn(E, H, W, 128), jnp.bfloat16)
    f2 = jnp.asarray(rng.randn(E, H, W, 128), jnp.bfloat16)
    coords = jnp.asarray(
        rng.rand(E, H, W, 2) * np.array([W - 1, H - 1]), jnp.float32)
    vshapes = corr_level_shapes(H, W)
    vols = jax.jit(pallas_build_volumes)(f1, f2)
    jax.block_until_ready(vols)

    base = jax.jit(lambda v, c: pallas_corr_extract(
        v, vshapes, c, packed=True))
    ref = np.asarray(base(vols, coords), np.float32)
    ms = device_time_ms(lambda: base(vols, coords))
    print(f"extract v1: {ms:.3f} ms (incl boundary copy)")

    for blk in (128, 256):
        fn = jax.jit(lambda v, c, b=blk: extract_v2(v, vshapes, c, b))
        got = np.asarray(fn(vols, coords), np.float32)
        HW = H * W
        got = got[:, :HW].reshape(ref.shape)
        err = float(np.abs(got - ref).max())
        ms = device_time_ms(lambda: fn(vols, coords))
        print(f"extract v2 blk={blk}: {ms:.3f} ms  max|d|={err:.5f}")


if __name__ == "__main__":
    main()
