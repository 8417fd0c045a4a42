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

Performance anatomy (measured on v5e, E=64 @30x101, blk=256 — keep for
future optimization rounds): the all-pairs MXU matmul costs ~0.65 ms
and the two batched extraction matmuls ~2.5 ms; the dominant cost
(~12 of ~16 ms) is the SELECTOR CONSTRUCTION — Mosaic lowers 3D
iota/compare/select and jnp.stack of 2D rows very slowly (stack alone
~3 ms per selector). Variants tried and rejected: K-padding the
batched matmul (no change), transposing the contraction to the lane
dim (no change), level-merged M=32 batched matmuls (no change — not
batch-count-bound), flattened (blk*8, X) 2D construction (worse),
XLA-precomputed selectors as kernel inputs (worse: HBM traffic),
per-tap VPU mask-reduce (VMEM OOM / Mosaic crashes). A faster kernel
needs either a Mosaic fix for small-minor-dim 3D ops or a true
per-sublane dynamic gather primitive.
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
TAPS = PATCH * PATCH          # 64 lane-aligned taps/level (49 valid)


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
        # the x-selector's static lane-rolls rely on wrapped (negative
        # or overflowing) taps landing in zero-padded lanes; widths in
        # (LANE - PATCH, LANE] would wrap into REAL columns and
        # silently corrupt left/right-edge windows
        assert W <= LANE - PATCH, \
            f"level width {W} exceeds roll-safe lane padding " \
            f"({LANE - PATCH})"
        pad = jnp.zeros((E, H, LANE - W, C), f.dtype)
        levels.append(jnp.concatenate([f, pad], axis=2))
        shapes.append((H, W))
        f = _pool2(f)
    return levels, shapes


def _kernel(f1_ref, c_ref, *refs, shapes, blk):
    """One (edge, query-block) program.

    The bilinear blend is BAKED into the two one-hot extraction
    operands: row selector A_y'[q, dy, r] carries the y-fraction and
    column selector B_x'[q, dx, l] the x-fraction, so

        out[q, dy, dx] = A_y'[q] @ corr_rows[q] @ B_x'[q]^T

    directly yields the bilinearly-interpolated 7x7 window (padded to
    8x8; pad rows/cols are all-zero selectors). This removes the
    (blk, 7, 7) strided blend/stores of the original kernel — the slow
    part on Mosaic — leaving two batched matmuls and one lane-aligned
    64-tap store per level.
    """
    n_lvl = len(shapes)
    lvl_refs = refs[:n_lvl]
    out_ref = refs[n_lvl]

    # both 0.25 prescales folded into f1 once per block — scaling the
    # (H_l, LANE, C) f2 levels per program costs ~1.2M VPU ops each
    f1 = f1_ref[0] * jnp.asarray(0.0625, f1_ref.dtype)  # (BLK, C)
    coords = c_ref[0].astype(jnp.float32)             # (BLK, 2)

    for l, (H_l, W_l) in enumerate(shapes):
        f2 = lvl_refs[l][0]                           # (H_l, LANE, C)
        C = f2.shape[-1]

        # MXU: all-pairs correlation rows for this block (bf16 inputs,
        # single-pass K=C accumulation; bf16 result rounding matches
        # the reference's fp16-autocast correlation)
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

        # y selector with baked bilinear: rows dy in [0, WIN) blend
        # grid rows py+dy and py+dy+1; pad row WIN..PATCH-1 is zero.
        iy = jax.lax.broadcasted_iota(jnp.int32, (blk, PATCH, H_l), 2)
        dy = jax.lax.broadcasted_iota(jnp.int32, (blk, PATCH, H_l), 1)
        py = by.astype(jnp.int32)[:, None, None] - RADIUS + dy
        row_ok = (dy < WIN).astype(jnp.float32)
        A_y = (((iy == py).astype(jnp.float32) * (1.0 - fy) +
                (iy == py + 1).astype(jnp.float32) * fy) * row_ok)

        # x selector from ONE base one-hot + static lane-rolls.
        # Q[q, l] = 1[l == px(q) + SHIFT] lives in a SHIFT-lane-shifted
        # space so taps with px+dx < 0 stay representable; rolling back
        # by dx - SHIFT aligns tap dx with true columns. Wrapped or
        # out-of-width selections land in f2's zero-padded lanes
        # (W_l <= LANE - PATCH always holds), reproducing the
        # out-of-range => 0 semantics with no extra masks. This is
        # ~8x cheaper than materializing 8 per-tap one-hot compares.
        SHIFT = PATCH
        ix1 = jax.lax.broadcasted_iota(jnp.int32, (blk, LANE), 1)
        px0 = bx.astype(jnp.int32)[:, None] - RADIUS + SHIFT
        Q = (ix1 == px0).astype(jnp.float32)          # (BLK, LANE)
        rolls = [jnp.roll(Q, dx - SHIFT, axis=-1)
                 for dx in range(PATCH)]              # dx and dx+1 taps
        fx1 = fx[:, :, 0]                             # (BLK, 1)
        B_x = jnp.stack(
            [(1.0 - fx1) * rolls[dx] + fx1 * rolls[dx + 1]
             for dx in range(WIN)] + [jnp.zeros_like(Q)],
            axis=1)                                   # (BLK, 8, LANE)

        # batched extraction: rows then columns
        tmp = jax.lax.dot_general(
            A_y, corr3,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # (BLK, 8, LANE)
        patch = jax.lax.dot_general(
            tmp, B_x,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # (BLK, 8, 8)
        patch = patch.astype(out_ref.dtype)

        # 8-lane-aligned stores of the level's 64-tap block (Mosaic
        # cannot shape-cast (blk, 8, 8) -> (blk, 64) directly)
        for dy in range(PATCH):
            base = l * TAPS + dy * PATCH
            out_ref[0, :, base:base + PATCH] = patch[:, dy, :]


@functools.partial(jax.jit,
                   static_argnames=("num_levels", "blk", "interpret",
                                    "packed"))
def pallas_corr_lookup(fmap1, fmap2, coords, num_levels=4, blk=256,
                       interpret=False, packed=False):
    """Fused correlation lookup.

    fmap1, fmap2: (E, H, W, C); coords: (E, H, W, 2) level-0 target
    coords. Returns (E, H, W, num_levels*49) fp32, channel layout
    identical to corr.lookup — or, with ``packed=True``, the raw
    (E, H, W, num_levels*64) bf16 tap blocks (each level's 7x7 window
    padded to 8x8; pad taps are exactly zero). Packed skips a ~4 ms
    relayout; consume it with expand_corr_weights-padded conv weights.
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

    out_ch = num_levels * TAPS

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

    out_dtype = jnp.bfloat16 if packed else jnp.float32
    out = pl.pallas_call(
        functools.partial(_kernel, shapes=tuple(shapes), blk=blk),
        out_shape=jax.ShapeDtypeStruct((E, HWp, out_ch), out_dtype),
        grid=(E, nb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, blk, out_ch),
                               lambda e, b: (e, b, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(f1, cfl, *levels)

    if packed:
        return out[:, :HW].reshape(E, H, W, out_ch)

    # padded (8x8) tap blocks -> the public 49-tap/level layout
    out = out[:, :HW].reshape(E, H, W, num_levels, PATCH, PATCH)
    out = out[..., :WIN, :WIN].reshape(E, H, W, num_levels * WIN * WIN)
    return out


def _kernel_path(node, prefix=()):
    """Path to the single conv 'kernel' leaf under a param subtree."""
    if "kernel" in node:
        return prefix + ("kernel",)
    subs = [k for k, v in node.items() if isinstance(v, dict) or
            hasattr(v, "items")]
    assert len(subs) == 1, subs
    return _kernel_path(node[subs[0]], prefix + (subs[0],))


def packed_update_params(params_update, num_levels=4):
    """Idempotently expand an update-module param tree for the packed
    corr layout (no-op when already expanded)."""
    node = params_update["params"]["corr_enc0"]
    for k in _kernel_path(node)[:-1]:
        node = node[k]
    if node["kernel"].shape[2] == num_levels * TAPS:
        return params_update
    return expand_corr_weights(params_update, num_levels)


def expand_corr_weights(params_update, num_levels=4):
    """Zero-pad a DynamicUpdateModule/UpdateModule param tree's first
    correlation conv (1x1, 196 -> 128) to accept the packed
    ``num_levels*64``-channel tap layout. Mathematically identical:
    pad input channels (dy==7 or dx==7) are exactly zero in the packed
    kernel output, and their weight rows are zero here."""
    import numpy as np

    def _expand(kernel):
        # flax conv kernel: (kh, kw, in_ch, out_ch)
        kh, kw, cin, cout = kernel.shape
        assert cin == num_levels * WIN * WIN, cin
        new = jnp.zeros((kh, kw, num_levels * TAPS, cout), kernel.dtype)
        src = np.arange(num_levels * WIN * WIN)
        l, r = src // (WIN * WIN), src % (WIN * WIN)
        dy, dx = r // WIN, r % WIN
        dst = l * TAPS + dy * PATCH + dx
        return new.at[:, :, dst, :].set(kernel)

    from flax.core import freeze, unfreeze
    was_frozen = not isinstance(params_update, dict)
    p = unfreeze(params_update) if was_frozen else \
        jax.tree_util.tree_map(lambda x: x, params_update)
    path = ("params", "corr_enc0") + _kernel_path(p["params"]["corr_enc0"])
    node = p
    for k in path[:-1]:
        node[k] = dict(node[k])
        node = node[k]
    node["kernel"] = _expand(node["kernel"])
    return freeze(p) if was_frozen else p
