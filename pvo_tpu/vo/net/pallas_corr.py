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

Performance anatomy (v5e, E=64 @30x101, blk=256; scripts/corr_exp.py
ablations, round 2): total ~13 ms = all-pairs corr matmuls ~4.3 +
extraction matmuls ~5.0 + selector construction ~3 (was ~12 in round 1
when built from per-dx jnp.roll + jnp.stack; now ONE two-hot compare
per axis + a matmul against the constant shift bank, see _shift_bank)
+ output stores ~2.5. Round-1 rejected variants (K-padding, transposed
contraction, level-merged batched matmuls, flattened 2D construction,
XLA-precomputed selectors, per-tap VPU mask-reduce) plus round-2
rejected variants: bf16 selectors/extraction (casts + relayouts cost
more than the MXU-rate gain: 15.8 vs 13.2), sublane-concat merging of
the 8 bank matmuls into one (worse, concat relayout), dy-major packed
stores via lane-concat (worse). Mosaic cannot concat 1D vectors at
all ("input offsets outside of the first tile").
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


# width of one x-tile: columns are PARTITIONED over tiles, and the
# 16 pad lanes absorb both the roll-wrap of left-edge taps and the
# straddle of windows into the next tile
TILE_W = LANE - 2 * PATCH  # 112


def build_padded_pyramid(fmap2, num_levels=4):
    """Pooled fmap2 levels, x- and y-TILED and lane-padded.

    Each level is (E, m_t, T_H, n_t, LANE, C): its true columns
    partitioned into ``n_t`` x-tiles of TILE_W zero-padded to LANE
    lanes, and its rows into ``m_t`` y-tiles of TILE_W rows
    (T_H = TILE_W when tiled, else the true H_l; the last y-tile's
    missing rows are zero — a zero f2 row correlates to zero, matching
    the CUDA out-of-bounds semantics). Narrow/short levels
    (dim <= LANE - PATCH) keep a single tile on that axis. A lookup
    window straddling a tile boundary on either axis is reconstructed
    by SUMMING per-tile extractions — every column/row is owned by
    exactly one tile, out-of-tile selections land in zero lanes /
    sliced-off selector lanes (see _kernel).

    Returns (levels, shapes) with shapes[l] = (H_l, W_l, n_t, m_t).
    """
    levels, shapes = [], []
    f = fmap2
    for _ in range(num_levels):
        E, H, W, C = f.shape
        if W <= LANE - PATCH:
            n_t = 1
            pad = jnp.zeros((E, H, LANE - W, C), f.dtype)
            tiled = jnp.concatenate([f, pad], axis=2)[:, :, None]
        else:
            n_t = -(-W // TILE_W)
            wpad = n_t * TILE_W - W
            fw = jnp.concatenate(
                [f, jnp.zeros((E, H, wpad, C), f.dtype)], axis=2)
            tiled = fw.reshape(E, H, n_t, TILE_W, C)
            tiled = jnp.concatenate(
                [tiled, jnp.zeros((E, H, n_t, LANE - TILE_W, C),
                                  f.dtype)], axis=3)
        # tiled: (E, H, n_t, LANE, C); now partition rows
        if H <= LANE - PATCH:
            m_t = 1
            tiled = tiled[:, None]
        else:
            m_t = -(-H // TILE_W)
            hpad = m_t * TILE_W - H
            tiled = jnp.concatenate(
                [tiled, jnp.zeros((E, hpad) + tiled.shape[2:],
                                  tiled.dtype)], axis=1)
            tiled = tiled.reshape((E, m_t, TILE_W) + tiled.shape[2:])
        levels.append(tiled)
        shapes.append((H, W, n_t, m_t))
        f = _pool2(f)
    return levels, shapes


def corr_vmem_bytes(h, w, C=128, itemsize=4, num_levels=4):
    """Estimated per-program VMEM footprint of the fused lookup's
    resident f2 pyramid: sum over levels of the PADDED block size
    (m_t, T_H, n_t, LANE, C) that build_padded_pyramid produces. The
    admission gate compares this against the ~16 MB/core VMEM budget
    (pallas_guide: VMEM ~16 MB) — a raw tile-count gate admitted
    geometries needing hundreds of MB (round-3 advisor finding)."""
    total = 0
    H, W = h, w
    for _ in range(num_levels):
        if W <= LANE - PATCH:
            n_t, lanes = 1, LANE
        else:
            n_t, lanes = -(-W // TILE_W), LANE
        if H <= LANE - PATCH:
            m_t, T_H = 1, H
        else:
            m_t, T_H = -(-H // TILE_W), TILE_W
        total += m_t * T_H * n_t * lanes * C * itemsize
        H, W = H // 2, W // 2
    return total


SHIFT = PATCH


def _shift_bank(dtype=jnp.float32):
    """Constant (LANE, PATCH*LANE) selector bank.

    R[i, d*LANE + j] = 1 iff j == (i + d - SHIFT) mod LANE, for taps
    d < WIN; the pad tap d in [WIN, PATCH) is all-zero. Multiplying a
    two-hot row vector Q (carrying the bilinear fraction at shifted
    lanes p0+SHIFT and p0+SHIFT+1) by R yields, reshaped to
    (PATCH, LANE), the full bank of WIN blended tap selectors — the
    per-tap roll/stack construction collapses into one MXU matmul.
    Entries are 0/1, exact in any dtype.
    """
    import numpy as np
    bank = np.zeros((LANE, PATCH * LANE), np.float32)
    i = np.arange(LANE)
    for d in range(WIN):
        bank[i, d * LANE + (i + d - SHIFT) % LANE] = 1.0
    return jnp.asarray(bank, dtype)


def _kernel(f1_ref, c_ref, r_ref, *refs, shapes, blk):
    """One (edge, query-block) program.

    The bilinear blend is BAKED into the two one-hot extraction
    operands: row selector A_y'[q, dy, r] carries the y-fraction and
    column selector B_x'[q, dx, l] the x-fraction, so

        out[q, dy, dx] = A_y'[q] @ corr_rows[q] @ B_x'[q]^T

    directly yields the bilinearly-interpolated 7x7 window (padded to
    8x8; pad rows/cols are all-zero selectors).

    Both selector banks are built by ONE two-hot compare each plus a
    matmul against the constant shift bank R (see _shift_bank): Mosaic
    lowers 3D iota/compare/stack very slowly (~12 of 16 ms/lookup in
    the previous kernel revision), while the (BLK, LANE) two-hot and
    the (BLK,LANE)@(LANE,8*LANE) matmul are near-free. Out-of-range
    taps vanish because (a) lane-wrap lands them in zero-padded f2
    lanes / sliced-off A_y lanes and (b) a two-hot beyond lane 127
    compares false everywhere — reproducing the CUDA out-of-bounds
    semantics with no masks. Levels larger than LANE - PATCH on either
    axis are x-/y-tiled (see build_padded_pyramid); every level stays
    FULLY resident in VMEM per program, so callers must gate admission
    by corr_vmem_bytes() (vo/factor_graph.py _use_pallas_corr).
    """
    n_lvl = len(shapes)
    lvl_refs = refs[:n_lvl]
    out_ref = refs[n_lvl]

    # both 0.25 prescales folded into f1 once per block — scaling the
    # (H_l, LANE, C) f2 levels per program costs ~1.2M VPU ops each
    f1 = f1_ref[0] * jnp.asarray(0.0625, f1_ref.dtype)  # (BLK, C)
    coords = c_ref[0].astype(jnp.float32)             # (BLK, 2)
    R = r_ref[...]                                    # (LANE, 8*LANE)

    # one iota serves both axes' two-hots on every level. Measured
    # alternatives (scripts/corr_exp.py): bf16 selectors/extraction
    # and sublane-merged bank matmuls are all SLOWER (casts/concat
    # relayouts dominate the MXU-rate gain); per-level f32 wins.
    ii = jax.lax.broadcasted_iota(jnp.int32, (blk, LANE), 1)

    def _sel(p, frac):
        """Two-hot selector rows -> full blended tap bank via R."""
        p0 = p.astype(jnp.int32)[:, None] - RADIUS + SHIFT
        f = frac[:, None]
        Q = ((ii == p0).astype(jnp.float32) * (1.0 - f) +
             (ii == p0 + 1).astype(jnp.float32) * f)  # (BLK, LANE)
        return jax.lax.dot_general(
            Q, R, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32
        ).reshape(blk, PATCH, LANE)

    for l, (H_l, W_l, n_t, m_t) in enumerate(shapes):
        f2 = lvl_refs[l][0]                 # (m_t, T_H, n_t, LANE, C)
        T_H = f2.shape[1]
        C = f2.shape[-1]

        cl = coords * jnp.float32(0.5 ** l)
        x, y = cl[:, 0], cl[:, 1]
        bx = jnp.floor(x)
        by = jnp.floor(y)

        # selectors in TILE-LOCAL coordinates: taps owned by other
        # tiles select this tile's zero-padded lanes (x) / sliced-off
        # selector lanes (y), so summing the per-tile extractions
        # reconstructs windows that straddle a tile boundary
        B_xs = [_sel(bx - (t * TILE_W), x - bx)       # (BLK, 8, LANE)
                for t in range(n_t)]

        patch = None
        for s in range(m_t):
            A_y = _sel(by - (s * T_H), y - by)[:, :, :T_H]
            for t in range(n_t):
                # MXU: all-pairs correlation rows against THIS tile
                # (bf16 inputs, single-pass K=C accumulation; bf16
                # result rounding matches the reference's
                # fp16-autocast corr)
                corr = jax.lax.dot_general(
                    f1, f2[s, :, t].reshape(T_H * LANE, C),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                corr3 = corr.reshape(blk, T_H, LANE)

                tmp = jax.lax.dot_general(
                    A_y, corr3,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)  # (BLK,8,LANE)
                p_t = jax.lax.dot_general(
                    tmp, B_xs[t],
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)  # (BLK, 8, 8)
                patch = p_t if patch is None else patch + p_t
        patch = patch.astype(out_ref.dtype)

        # 8-lane-aligned stores of the level's 64-tap block (Mosaic
        # cannot shape-cast (blk, 8, 8) -> (blk, 64) directly)
        for dy in range(PATCH):
            base = l * TAPS + dy * PATCH
            out_ref[0, :, base:base + PATCH] = patch[:, dy, :]


def _extract_kernel(c_ref, r_ref, vol_ref, out_ref, *, shapes, blk):
    """Extraction-only variant of :func:`_kernel`: reads the PRE-BUILT
    stacked correlation volume instead of computing the all-pairs
    matmul. Used by the frontend's volume cache — the volume depends
    only on the feature maps, so the 4+2 update iterations of one
    keyframe share one build (the matmul was ~1/3 of each lookup).
    The stacked layout makes the block fetch ONE wide DMA (see
    _build_kernel); the bf16 rows feed the selector matmuls directly
    (mixed bf16 x f32 dot with f32 accumulation is bit-identical to
    the old upcast and halves the VMEM block)."""
    offs, _ = _vol_offsets(shapes)
    coords = c_ref[0].astype(jnp.float32)             # (BLK, 2)
    R = r_ref[...]
    vol = vol_ref[0]                           # (BLK, H_sum, LANE)

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
        corr3 = vol[:, offs[l]:offs[l] + H_l, :]  # (BLK, H_l, LANE)

        cl = coords * jnp.float32(0.5 ** l)
        x, y = cl[:, 0], cl[:, 1]
        bx = jnp.floor(x)
        by = jnp.floor(y)

        A_y = _sel(by, y - by)[:, :, :H_l]
        B_x = _sel(bx, x - bx)

        tmp = jax.lax.dot_general(
            A_y, corr3,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        patch = jax.lax.dot_general(
            tmp, B_x,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        patch = patch.astype(out_ref.dtype)

        for dy in range(PATCH):
            base = l * TAPS + dy * PATCH
            out_ref[0, :, base:base + PATCH] = patch[:, dy, :]


def corr_level_shapes(H, W, num_levels=4):
    """Static (H_l, W_l, n_t, m_t) per level, mirroring
    :func:`build_padded_pyramid` (floor-halving pool, tile counts)."""
    shapes = []
    for _ in range(num_levels):
        n_t = 1 if W <= LANE - PATCH else -(-W // TILE_W)
        m_t = 1 if H <= LANE - PATCH else -(-H // TILE_W)
        shapes.append((H, W, n_t, m_t))
        H, W = H // 2, W // 2
    return tuple(shapes)


def _vol_offsets(shapes):
    """Static row offsets of each pyramid level inside the STACKED
    volume buffer (rows dim = sum of level heights)."""
    offs, acc = [], 0
    for (H_l, _, _, _) in shapes:
        offs.append(acc)
        acc += H_l
    return tuple(offs), acc


def _vol_rows(shapes):
    """Stacked-volume row count, padded to the bf16 (16, 128) HBM
    tile: the manually-pipelined extraction DMAs whole row-blocks and
    Mosaic's emit_pipeline rejects non-16-aligned second-minor block
    dims (opaque tpu_compile_helper failure, diagnosed round 5)."""
    _, H_sum = _vol_offsets(shapes)
    return -(-H_sum // 16) * 16


def _build_kernel(f1_ref, *refs, shapes, blk):
    """One (edge, query-block) program of the volume builder: the
    all-pairs half of :func:`_kernel`, stored instead of consumed.
    All levels land in ONE stacked output (level l at row offset
    off_l) — separate per-level buffers paid the bf16 (16, 128) HBM
    tile padding on every level (rows 7 -> 16, 3 -> 16: levels 2/3
    cost as much as level 1) and one DMA per level per grid step;
    stacked, the extraction streams the whole pyramid row-block in a
    single DMA with one shared pad (round-5 corr_exp3: extraction was
    DMA-bound at ~25% of HBM peak)."""
    n_lvl = len(shapes)
    lvl_refs = refs[:n_lvl]
    out_ref = refs[n_lvl]
    offs, H_sum = _vol_offsets(shapes)
    f1 = f1_ref[0] * jnp.asarray(0.0625, f1_ref.dtype)   # (BLK, C)
    for l, (H_l, W_l, n_t, m_t) in enumerate(shapes):
        f2 = lvl_refs[l][0]                    # (1, H_l, 1, LANE, C)
        C = f2.shape[-1]
        corr = jax.lax.dot_general(
            f1, f2.reshape(H_l * LANE, C),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)   # (BLK, H_l*LANE)
        out_ref[0, :, offs[l]:offs[l] + H_l, :] = corr.reshape(
            blk, H_l, LANE).astype(out_ref.dtype)
    H_pad = out_ref.shape[2]
    if H_pad > H_sum:
        # zero the alignment pad rows (never read; zeroed so the XLA
        # build path is bit-identical)
        out_ref[0, :, H_sum:H_pad, :] = jnp.zeros(
            (blk, H_pad - H_sum, LANE), out_ref.dtype)


def pallas_build_volumes(fmap1, fmap2, num_levels=4, blk=256):
    """All-pairs correlation volumes via a Pallas kernel.

    Returns ONE stacked (E, HWp, sum_l H_l, LANE) bf16 buffer (level
    l's rows at offset off_l, see _vol_offsets) BORN in the layout
    :func:`pallas_corr_extract` wants: the XLA build's dot_general
    output needed a full-HBM relayout copy per level (~7 ms at the
    48-edge tracking shapes) before every chain of extractions, which
    is why the round-1 volume cache measured perf-neutral. Narrow
    streams only (n_t == 1 on every level).
    """
    E, H, W, C = fmap1.shape
    HW = H * W
    HWp = ((HW + blk - 1) // blk) * blk
    nb = HWp // blk
    levels, shapes = build_padded_pyramid(fmap2, num_levels)
    H_pad = _vol_rows(shapes)

    f1 = fmap1.reshape(E, HW, C)
    if HWp != HW:
        f1 = jnp.concatenate(
            [f1, jnp.zeros((E, HWp - HW, C), f1.dtype)], axis=1)

    in_specs = [pl.BlockSpec((1, blk, C), lambda e, b: (e, b, 0),
                             memory_space=pltpu.VMEM)]
    for (H_l, _, n_t, m_t), lvl in zip(shapes, levels):
        assert n_t == 1 and m_t == 1, \
            "volume cache supports narrow streams only"
        in_specs.append(pl.BlockSpec(
            (1, 1, H_l, 1, LANE, C), lambda e, b: (e, 0, 0, 0, 0, 0),
            memory_space=pltpu.VMEM))
    vols = pl.pallas_call(
        functools.partial(_build_kernel, shapes=tuple(shapes), blk=blk),
        out_shape=jax.ShapeDtypeStruct((E, HWp, H_pad, LANE),
                                       jnp.bfloat16),
        grid=(E, nb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, blk, H_pad, LANE),
                               lambda e, b: (e, b, 0, 0),
                               memory_space=pltpu.VMEM),
    )(f1, *levels)
    return vols


def build_corr_volumes(fmap1, fmap2, num_levels=4, blk=256):
    """All-pairs correlation volumes via XLA ops (CPU/test path).

    Returns (vols, shapes): vols is the STACKED (E, HWp, sum H_l,
    LANE) bf16 buffer of :func:`pallas_build_volumes` (the reference's
    CorrBlock materializes fp16 volumes the same way, corr.py:29-38)
    with both 0.25 prescales applied; shapes[l] the true (H_l, W_l).
    """
    E, H, W, C = fmap1.shape
    HW = H * W
    HWp = ((HW + blk - 1) // blk) * blk
    levels, shapes = build_padded_pyramid(fmap2, num_levels)

    f1 = fmap1.reshape(E, HW, C) * jnp.asarray(0.0625, fmap1.dtype)
    if HWp != HW:
        f1 = jnp.concatenate(
            [f1, jnp.zeros((E, HWp - HW, C), f1.dtype)], axis=1)

    vols = []
    for (H_l, _, n_t, m_t), lvl in zip(shapes, levels):
        assert n_t == 1 and m_t == 1, \
            "volume cache supports narrow streams only"
        lvl = lvl[:, 0, :, 0]
        f2f = lvl.reshape(E, H_l * LANE, C)
        v = jax.lax.dot_general(
            f1, f2f, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # (E, HWp, H_l*128)
        vols.append(v.astype(jnp.bfloat16).reshape(E, HWp, H_l, LANE))
    _, H_sum = _vol_offsets(shapes)
    H_pad = _vol_rows(shapes)
    if H_pad > H_sum:
        vols.append(jnp.zeros((E, HWp, H_pad - H_sum, LANE),
                              jnp.bfloat16))
    return jnp.concatenate(vols, axis=2), shapes


@functools.partial(jax.jit,
                   static_argnames=("shapes", "blk", "interpret",
                                    "packed"))
def pallas_corr_extract(vols, shapes, coords, blk=256,
                        interpret=False, packed=False):
    """Windowed lookup from pre-built volumes (see build_corr_volumes).

    coords: (E, H, W, 2) level-0 target coords. Output layout matches
    :func:`pallas_corr_lookup` (values are bf16-volume-rounded, like
    the reference's fp16 CorrBlock).
    """
    E, H, W, _ = coords.shape
    HW = H * W
    num_levels = len(shapes)
    HWp = vols.shape[1]
    H_pad = vols.shape[2]

    # VMEM admission: the stacked block (blk, H_pad, LANE) bf16 is
    # double-buffered; shrink blk for tall pyramids (blk always
    # divides HWp: build pads HWp to a 256-multiple). 128 measured
    # fastest at tracking shapes (scripts/corr_exp5.py).
    blk = min(blk, 128)
    while blk > 64 and 2 * blk * H_pad * LANE * 2 > 10 * 2 ** 20:
        blk //= 2
    nb = HWp // blk

    cfl = coords.reshape(E, HW, 2)
    if HWp != HW:
        cfl = jnp.concatenate(
            [cfl, jnp.zeros((E, HWp - HW, 2), cfl.dtype)], axis=1)
    # lane-pad: 2-lane blocks trip Mosaic inside emit_pipeline
    cfl = jnp.pad(cfl, ((0, 0), (0, 0), (0, LANE - 2)))

    out_ch = num_levels * TAPS
    out_dtype = jnp.bfloat16 if packed else jnp.float32

    if interpret:
        # CPU/test path: plain auto-pipelined grid (emit_pipeline has
        # no interpret support)
        out = pl.pallas_call(
            functools.partial(_extract_kernel, shapes=tuple(shapes),
                              blk=blk),
            out_shape=jax.ShapeDtypeStruct((E, HWp, out_ch),
                                           out_dtype),
            grid=(E, nb),
            in_specs=[
                pl.BlockSpec((1, blk, LANE), lambda e, b: (e, b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((LANE, PATCH * LANE),
                             lambda e, b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, blk, H_pad, LANE),
                             lambda e, b: (e, b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, blk, out_ch),
                                   lambda e, b: (e, b, 0),
                                   memory_space=pltpu.VMEM),
            interpret=True,
        )(cfl, _shift_bank(), vols)
    else:
        # TPU path: manual inner pipeline — the next block's volume
        # DMA overlaps this block's selector/extract compute, and the
        # ANY-space operands skip the XLA boundary relayout a VMEM
        # operand of this size pays (round-5 corr_exp5: 3.2 ms vs
        # 4.3 + copy at the 24-edge tracking shapes)
        def _outer(c_hbm, r_ref, vol_hbm, out_hbm):
            pipe = pltpu.emit_pipeline(
                lambda c_ref, vol_ref, out_ref: _extract_kernel(
                    c_ref, r_ref, vol_ref, out_ref,
                    shapes=tuple(shapes), blk=blk),
                grid=(E, nb),
                in_specs=[
                    pl.BlockSpec((1, blk, LANE),
                                 lambda e, b: (e, b, 0)),
                    pl.BlockSpec((1, blk, H_pad, LANE),
                                 lambda e, b: (e, b, 0, 0)),
                ],
                out_specs=[pl.BlockSpec((1, blk, out_ch),
                                        lambda e, b: (e, b, 0))],
            )
            pipe(c_hbm, vol_hbm, out_hbm)

        out = pl.pallas_call(
            _outer,
            out_shape=jax.ShapeDtypeStruct((E, HWp, out_ch),
                                           out_dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((LANE, PATCH * LANE),
                             lambda: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        )(cfl, _shift_bank(), vols)

    if packed:
        return out[:, :HW].reshape(E, H, W, out_ch)
    out = out[:, :HW].reshape(E, H, W, num_levels, PATCH, PATCH)
    out = out[..., :WIN, :WIN].transpose(0, 1, 2, 3, 5, 4)
    return out.reshape(E, H, W, num_levels * WIN * WIN)


@functools.partial(jax.jit,
                   static_argnames=("num_levels", "blk", "interpret",
                                    "packed"))
def pallas_corr_lookup(fmap1, fmap2, coords, num_levels=4, blk=128,
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
        pl.BlockSpec((LANE, PATCH * LANE), lambda e, b: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    for (H_l, _, n_t, m_t), lvl in zip(shapes, levels):
        T_H = lvl.shape[2]
        in_specs.append(pl.BlockSpec(
            (1, m_t, T_H, n_t, LANE, C),
            lambda e, b: (e, 0, 0, 0, 0, 0),
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
    )(f1, cfl, _shift_bank(fmap1.dtype), *levels)

    if packed:
        return out[:, :HW].reshape(E, H, W, out_ch)

    # padded (8x8) tap blocks -> the public layout (level-major,
    # dx-major taps, matching the reference CUDA channel order)
    out = out[:, :HW].reshape(E, H, W, num_levels, PATCH, PATCH)
    out = out[..., :WIN, :WIN].transpose(0, 1, 2, 3, 5, 4)
    return out.reshape(E, H, W, num_levels * WIN * WIN)


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
    kernel output, and their weight rows are zero here.

    Source channels follow the reference CUDA order (level-major,
    dx-major within a level, correlation_kernels.cu:46-66); packed
    channels are dy-major (see _kernel's store layout).
    """
    import numpy as np

    def _expand(kernel):
        # flax conv kernel: (kh, kw, in_ch, out_ch)
        kh, kw, cin, cout = kernel.shape
        assert cin == num_levels * WIN * WIN, cin
        new = jnp.zeros((kh, kw, num_levels * TAPS, cout), kernel.dtype)
        src = np.arange(num_levels * WIN * WIN)
        l, r = src // (WIN * WIN), src % (WIN * WIN)
        dx, dy = r // WIN, r % WIN
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
