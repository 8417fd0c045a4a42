"""Ablation harness for the Pallas corr kernel variants.

Knobs: selector merge level, selector dtype, store layout.
Usage: python -u scripts/corr_exp.py
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
    LANE, PATCH, RADIUS, TAPS, WIN, SHIFT,
    _shift_bank, build_padded_pyramid)


def _pack_mat(dtype):
    """(8, 8, 64) one-hot: M[dy, dx, dy*8+dx] = 1."""
    m = np.zeros((PATCH, PATCH, TAPS), np.float32)
    for dy in range(PATCH):
        for dx in range(PATCH):
            m[dy, dx, dy * PATCH + dx] = 1.0
    return jnp.asarray(m, dtype)


def _kernel(f1_ref, c_ref, r_ref, m_ref, *refs, shapes, blk, merge,
            store):
    n_lvl = len(shapes)
    lvl_refs = refs[:n_lvl]
    out_ref = refs[n_lvl]

    f1 = f1_ref[0] * jnp.asarray(0.0625, f1_ref.dtype)
    coords = c_ref[0].astype(jnp.float32)
    R = r_ref[...]
    sel = R.dtype

    ii = jax.lax.broadcasted_iota(jnp.int32, (blk, LANE), 1)

    def two_hot(v):
        b = jnp.floor(v)
        p0 = (b.astype(jnp.int32) - RADIUS + SHIFT)[:, None]
        fr = (v - b)[:, None].astype(sel)
        return ((ii == p0).astype(sel) * (1 - fr) +
                (ii == p0 + 1).astype(sel) * fr)

    def bank(Q):
        return jax.lax.dot_general(
            Q, R, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(sel)

    sels = {}
    if merge == "all":
        qs = []
        for l in range(n_lvl):
            cl = coords * jnp.float32(0.5 ** l)
            qs.append(two_hot(cl[:, 0]))
            qs.append(two_hot(cl[:, 1]))
        QR = bank(jnp.concatenate(qs, axis=0)).reshape(
            n_lvl * 2, blk, PATCH, LANE)
        for l in range(n_lvl):
            sels[l] = (QR[2 * l], QR[2 * l + 1])
    elif merge == "axis":
        for l in range(n_lvl):
            cl = coords * jnp.float32(0.5 ** l)
            QR = bank(jnp.concatenate(
                [two_hot(cl[:, 0]), two_hot(cl[:, 1])],
                axis=0)).reshape(2, blk, PATCH, LANE)
            sels[l] = (QR[0], QR[1])
    else:  # none
        for l in range(n_lvl):
            cl = coords * jnp.float32(0.5 ** l)
            bx = bank(two_hot(cl[:, 0])).reshape(blk, PATCH, LANE)
            ay = bank(two_hot(cl[:, 1])).reshape(blk, PATCH, LANE)
            sels[l] = (bx, ay)

    patches = []
    for l, (H_l, W_l, _nt, _mt) in enumerate(shapes):
        f2 = lvl_refs[l][0, 0, :, 0]
        C = f2.shape[-1]
        corr = jax.lax.dot_general(
            f1, f2.reshape(H_l * LANE, C),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        corr3 = corr.astype(sel).reshape(blk, H_l, LANE)

        B_x, A_yf = sels[l]
        A_y = A_yf[:, :, :H_l]

        tmp = jax.lax.dot_general(
            A_y, corr3,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        patch = jax.lax.dot_general(
            tmp.astype(sel), B_x,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        patch = patch.astype(out_ref.dtype)

        if store == "perlevel":
            for dy in range(PATCH):
                base = l * TAPS + dy * PATCH
                out_ref[0, :, base:base + PATCH] = patch[:, dy, :]
        elif store == "matpack":
            # (blk, 8, 8) -> (blk, 64) via per-dy one-hot placement
            # matmuls (lane-shift each dy row-block into its slot),
            # then ONE 64-lane-aligned store
            M = m_ref[...].astype(sel)  # (8*8, 64)
            flat = None
            for dy in range(PATCH):
                f_dy = jax.lax.dot_general(
                    patch[:, dy, :].astype(sel),
                    M[dy * PATCH:(dy + 1) * PATCH, :],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                flat = f_dy if flat is None else flat + f_dy
            out_ref[0, :, l * TAPS:(l + 1) * TAPS] = \
                flat.astype(out_ref.dtype)
        else:
            patches.append(patch)

    if store == "dymajor":
        LW = n_lvl * PATCH
        for dy in range(PATCH):
            out_ref[0, :, dy * LW:(dy + 1) * LW] = jnp.concatenate(
                [p[:, dy, :] for p in patches], axis=-1)


@functools.partial(jax.jit,
                   static_argnames=("blk", "merge", "store", "seldt"))
def run(fmap1, fmap2, coords, blk=256, merge="all", store="dymajor",
        seldt="bf16"):
    E, H, W, C = fmap1.shape
    HW = H * W
    levels, shapes = build_padded_pyramid(fmap2, 4)
    HWp = ((HW + blk - 1) // blk) * blk
    nb = HWp // blk
    f1 = fmap1.reshape(E, HW, C)
    cfl = coords.reshape(E, HW, 2)
    if HWp != HW:
        f1 = jnp.concatenate(
            [f1, jnp.zeros((E, HWp - HW, C), f1.dtype)], axis=1)
        cfl = jnp.concatenate(
            [cfl, jnp.zeros((E, HWp - HW, 2), cfl.dtype)], axis=1)
    out_ch = 4 * TAPS
    in_specs = [
        pl.BlockSpec((1, blk, C), lambda e, b: (e, b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk, 2), lambda e, b: (e, b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((LANE, PATCH * LANE), lambda e, b: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((PATCH * PATCH, TAPS), lambda e, b: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    for (H_l, _, _nt, _mt), lvl in zip(shapes, levels):
        in_specs.append(pl.BlockSpec(
            (1, 1, H_l, 1, LANE, C), lambda e, b: (e, 0, 0, 0, 0, 0),
            memory_space=pltpu.VMEM))
    dt = jnp.bfloat16 if seldt == "bf16" else jnp.float32
    return pl.pallas_call(
        functools.partial(_kernel, shapes=tuple(shapes), blk=blk,
                          merge=merge, store=store),
        out_shape=jax.ShapeDtypeStruct((E, HWp, out_ch), jnp.bfloat16),
        grid=(E, nb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, blk, out_ch),
                               lambda e, b: (e, b, 0),
                               memory_space=pltpu.VMEM),
    )(f1, cfl, _shift_bank(dt),
      _pack_mat(dt).reshape(PATCH * PATCH, TAPS), *levels)


def main():
    E, H, W, C = 64, 30, 101, 128
    rng = np.random.RandomState(0)
    f1 = jnp.asarray(rng.randn(E, H, W, C), jnp.bfloat16)
    f2 = jnp.asarray(rng.randn(E, H, W, C), jnp.bfloat16)
    coords = jnp.asarray(
        rng.rand(E, H, W, 2) * np.array([W - 1, H - 1]), jnp.float32)
    cases = [
        ("none", "perlevel", "f32"),
        ("none", "matpack", "f32"),
    ]
    for merge, store, seldt in cases:
        ms = device_time_ms(lambda: run(f1, f2, coords, merge=merge,
                                        store=store, seldt=seldt))
        print(f"merge={merge:5s} store={store:8s} sel={seldt:4s}: "
              f"{ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
