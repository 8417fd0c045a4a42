"""Pallas TPU kernel: fused all-pairs correlation + windowed lookup.

TPU-native replacement for the reference's altcorr CUDA kernel
(VO_Module/src/altcorr_kernel.cu) exploiting two structural facts:

  1. correlation is LINEAR in fmap2, so pyramid levels of the
     correlation volume equal correlations against avg-pooled fmap2 —
     no volume pyramid is ever materialized (the same trick behind the
     reference's AltCorrBlock, corr.py:91-139);
  2. the (2r+1)^2 window taps share one bilinear fraction, so the
     whole lookup is: one MXU matmul per level (f1 block against the
     pooled fmap2), an 8-row/8-col ONE-HOT extraction expressed as two
     tiny batched matmuls (no gather — out-of-range taps vanish because
     their one-hot row is all zero, matching the CUDA out-of-bounds
     semantics), and a 4-term bilinear blend on the VPU.

Layout trick: each pooled fmap2 level is zero-padded to 128 lanes in
width, so the flat matmul result (BLK, H_l*128) reshapes to
(BLK, H_l, 128) as a pure relayout.

The public entry falls back to the XLA gather implementation off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
RADIUS = 3
WIN = 2 * RADIUS + 1          # 7
PATCH = 2 * RADIUS + 2        # 8


def _pool2(x):
    """(E, H, W, C) -> (E, H//2, W//2, C) mean pool (floor)."""
    E, H, W, C = x.shape
    H2, W2 = H // 2, W // 2
    return x[:, :2 * H2, :2 * W2].reshape(
        E, H2, 2, W2, 2, C).mean(axis=(2, 4))


def build_padded_pyramid(fmap2, num_levels=4):
    """Pooled fmap2 levels, each width-padded to LANE columns.

    Returns (levels, shapes): levels[l] is (E, H_l, LANE, C);
    shapes[l] = (H_l, W_l) true sizes.
    """
    levels, shapes = [], []
    f = fmap2
    for _ in range(num_levels):
        E, H, W, C = f.shape
        assert W <= LANE, f"level width {W} exceeds lane padding"
        pad = jnp.zeros((E, H, LANE - W, C), f.dtype)
        levels.append(jnp.concatenate([f, pad], axis=2))
        shapes.append((H, W))
        f = _pool2(f)
    return levels, shapes


def _kernel(f1_ref, c_ref, *refs, shapes, blk):
    """One (edge, query-block) program."""
    n_lvl = len(shapes)
    lvl_refs = refs[:n_lvl]
    out_ref = refs[n_lvl]

    f1 = f1_ref[0] * jnp.asarray(0.25, f1_ref.dtype)  # (BLK, C)
    coords = c_ref[0].astype(jnp.float32)             # (BLK, 2)

    offs = 0
    for l, (H_l, W_l) in enumerate(shapes):
        f2 = lvl_refs[l][0] * jnp.asarray(
            0.25, lvl_refs[l].dtype)                  # (H_l, LANE, C)
        C = f2.shape[-1]

        # MXU: all-pairs correlation rows for this block (bf16 inputs
        # accumulate in fp32)
        corr = jax.lax.dot_general(
            f1, f2.reshape(H_l * LANE, C),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # (BLK, H_l*LANE)
        corr3 = corr.reshape(blk, H_l, LANE)

        cl = coords / (2.0 ** l)
        x, y = cl[:, 0], cl[:, 1]
        bx = jnp.floor(x)
        by = jnp.floor(y)
        fx = (x - bx)[:, None, None]
        fy = (y - by)[:, None, None]

        # one-hot row/col selectors; out-of-range rows select nothing
        iy = jax.lax.broadcasted_iota(jnp.int32, (blk, PATCH, H_l), 2)
        py = (by.astype(jnp.int32)[:, None, None] - RADIUS +
              jax.lax.broadcasted_iota(jnp.int32, (blk, PATCH, H_l), 1))
        A_y = (iy == py).astype(jnp.float32)          # (BLK, 8, H_l)

        ix = jax.lax.broadcasted_iota(jnp.int32, (blk, PATCH, LANE), 2)
        px = (bx.astype(jnp.int32)[:, None, None] - RADIUS +
              jax.lax.broadcasted_iota(jnp.int32, (blk, PATCH, LANE), 1))
        in_w = ix < W_l
        A_x = ((ix == px) & in_w).astype(jnp.float32)  # (BLK, 8, LANE)

        # batched extraction: rows then columns
        tmp = jax.lax.dot_general(
            A_y, corr3,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # (BLK, 8, LANE)
        patch = jax.lax.dot_general(
            tmp, A_x,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # (BLK, 8, 8)

        p00 = patch[:, :WIN, :WIN]
        p01 = patch[:, :WIN, 1:]
        p10 = patch[:, 1:, :WIN]
        p11 = patch[:, 1:, 1:]
        out = ((1 - fy) * (1 - fx) * p00 + (1 - fy) * fx * p01 +
               fy * (1 - fx) * p10 + fy * fx * p11)

        # write row-by-row: Mosaic cannot shape-cast (blk,7,7)->(blk,49)
        for dy in range(WIN):
            out_ref[0, :, offs + dy * WIN: offs + (dy + 1) * WIN] = \
                out[:, dy, :]
        offs += WIN * WIN


@functools.partial(jax.jit,
                   static_argnames=("num_levels", "blk", "interpret"))
def pallas_corr_lookup(fmap1, fmap2, coords, num_levels=4, blk=256,
                       interpret=False):
    """Fused correlation lookup.

    fmap1, fmap2: (E, H, W, C); coords: (E, H, W, 2) level-0 target
    coords. Returns (E, H, W, num_levels*49) fp32, channel layout
    identical to corr.lookup.
    """
    E, H, W, C = fmap1.shape
    HW = H * W
    levels, shapes = build_padded_pyramid(fmap2, num_levels)

    HWp = ((HW + blk - 1) // blk) * blk
    nb = HWp // blk
    f1 = fmap1.reshape(E, HW, C)
    cfl = coords.reshape(E, HW, 2)
    if HWp != HW:
        f1 = jnp.concatenate(
            [f1, jnp.zeros((E, HWp - HW, C), f1.dtype)], axis=1)
        cfl = jnp.concatenate(
            [cfl, jnp.zeros((E, HWp - HW, 2), cfl.dtype)], axis=1)

    out_ch = num_levels * WIN * WIN

    in_specs = [
        pl.BlockSpec((1, blk, C), lambda e, b: (e, b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk, 2), lambda e, b: (e, b, 0),
                     memory_space=pltpu.VMEM),
    ]
    for (H_l, _), lvl in zip(shapes, levels):
        in_specs.append(pl.BlockSpec(
            (1, H_l, LANE, C), lambda e, b: (e, 0, 0, 0),
            memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        functools.partial(_kernel, shapes=tuple(shapes), blk=blk),
        out_shape=jax.ShapeDtypeStruct((E, HWp, out_ch), jnp.float32),
        grid=(E, nb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, blk, out_ch),
                               lambda e, b: (e, b, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(f1, cfl, *levels)

    return out[:, :HW].reshape(E, H, W, out_ch)
