"""Extraction kernel v3: manual inner pipeline (pltpu.emit_pipeline)
so the next query-block's volume DMA overlaps the current block's
selector/extract compute — the auto-pipelined outer-grid version
measures as DMA + compute SERIALIZED (4.4 ms/call vs the 2.1 ms pure
DMA floor, scripts/corr_exp3.py round-5 diagnostics).

STATUS (round 5): the emit_pipeline variant trips an opaque Mosaic
internal error (remote tpu_compile_helper exit 1) on this toolchain at
both blk=128/256; recorded as a dead end — the shipped kernel keeps the
auto-pipelined outer grid. Findings that DID land from this series:
stacked single-buffer volume (one DMA/step), EB_S=24 regime.

Usage: python scripts/corr_exp5.py [E [H W]]
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


def _block_compute(coords, R, vol, shapes, blk):
    """One query block: returns (blk, out_ch) f32 tap accumulation.
    Same math as the production _extract_kernel (v1 layout: per-dy
    8-lane stores are replaced by returning the full row built from
    per-dy placement into a register accumulator)."""
    offs, _ = _vol_offsets(shapes)
    n_lvl = len(shapes)
    ii = jax.lax.broadcasted_iota(jnp.int32, (blk, LANE), 1)

    def _two_hot(cl, ax):
        p = jnp.floor(cl[:, ax])
        f = (cl[:, ax] - p)[:, None]
        p0 = p.astype(jnp.int32)[:, None] - RADIUS + SHIFT
        return ((ii == p0).astype(jnp.float32) * (1.0 - f) +
                (ii == p0 + 1).astype(jnp.float32) * f)

    outs = []
    for l, (H_l, W_l, _n_t, _m_t) in enumerate(shapes):
        corr3 = vol[:, offs[l]:offs[l] + H_l, :]
        cl = coords * jnp.float32(0.5 ** l)
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
            preferred_element_type=jnp.float32)
        outs.append(patch)
    return outs


def _outer_kernel(c_hbm, r_ref, vol_hbm, out_hbm, *, shapes, blk,
                  nb, E):
    n_lvl = len(shapes)
    H_sum = vol_hbm.shape[2]
    out_ch = n_lvl * TAPS

    def body(c_ref, vol_ref, out_ref):
        # bank read INSIDE the pipeline body: values captured across
        # the emit_pipeline closure are another Mosaic-500 suspect
        R = r_ref[...]
        # coords padded to LANE lanes (a 2-lane block spec trips the
        # Mosaic compiler inside emit_pipeline)
        coords = c_ref[0][:, :2].astype(jnp.float32)
        patches = _block_compute(coords, R, vol_ref[0], shapes, blk)
        for l, patch in enumerate(patches):
            p8 = patch.astype(out_ref.dtype)
            for dy in range(PATCH):
                base = l * TAPS + dy * PATCH
                out_ref[0, :, base:base + PATCH] = p8[:, dy, :]

    pipe = pltpu.emit_pipeline(
        body, grid=(E, nb),
        in_specs=[
            pl.BlockSpec((1, blk, LANE), lambda e, b: (e, b, 0)),
            pl.BlockSpec((1, blk, H_sum, LANE),
                         lambda e, b: (e, b, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, blk, out_ch),
                                lambda e, b: (e, b, 0))],
    )
    pipe(c_hbm, vol_hbm, out_hbm)


def extract_v3(vols, shapes, coords, blk=256):
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
    cfl = jnp.pad(cfl, ((0, 0), (0, 0), (0, LANE - 2)))
    out_ch = n_lvl * TAPS
    return pl.pallas_call(
        functools.partial(_outer_kernel, shapes=tuple(shapes),
                          blk=blk, nb=nb, E=E),
        out_shape=jax.ShapeDtypeStruct((E, HWp, out_ch), jnp.bfloat16),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
    )(cfl, _shift_bank(), vols)


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
    # emit_pipeline requires 16-aligned second-minor block dims
    # (H=55 trips the opaque Mosaic 500; H=64 compiles): pad rows
    Hp = -(-vols.shape[2] // 16) * 16
    vols_p = jnp.pad(vols, ((0, 0), (0, 0),
                            (0, Hp - vols.shape[2]), (0, 0)))
    jax.block_until_ready(vols_p)

    base = jax.jit(lambda v, c: pallas_corr_extract(
        v, vshapes, c, packed=True))
    ref = np.asarray(base(vols, coords), np.float32)
    ms = device_time_ms(lambda: base(vols, coords))
    print(f"extract v1: {ms:.3f} ms (incl boundary copy)")

    HW = H * W
    for blk in (128, 256):
        try:
            fn = jax.jit(lambda v, c, b=blk: extract_v3(v, vshapes,
                                                        c, b))
            got = np.asarray(fn(vols_p, coords), np.float32)[:, :HW]
            got = got.reshape(ref.shape)
            err = float(np.abs(got - ref).max())
            ms = device_time_ms(lambda: fn(vols_p, coords))
            print(f"extract v3 blk={blk}: {ms:.3f} ms  "
                  f"max|d|={err:.5f}")
        except Exception as e:  # noqa: BLE001
            print(f"extract v3 blk={blk}: FAIL "
                  f"{type(e).__name__}: {str(e)[:150]}")


if __name__ == "__main__":
    main()
