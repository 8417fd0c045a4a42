"""All-pairs correlation pyramid + windowed lookup, TPU-native.

Rebuild of the reference CorrBlock / AltCorrBlock / CUDA lookup kernels
(VO_Module/droid_slam/modules/corr.py, src/correlation_kernels.cu,
src/altcorr_kernel.cu) with an XLA-first design:

  * the all-pairs volume is ONE batched matmul (MXU) instead of a CUDA
    kernel; pyramid levels are average pools;
  * the (2r+1)^2 bilinear window lookup uses the shared-fraction patch
    trick: because window offsets are integers, all 49 taps share one
    bilinear fraction, so we gather an (2r+2)^2 integer patch per query
    pixel (a single flat XLA gather) and blend 4 shifted views — instead
    of 49 separate bilinear samples;
  * out-of-bounds taps contribute zero, matching the CUDA
    ``within_bounds`` semantics (correlation_kernels.cu:19-72);
  * the low-memory "alt" path for global BA evaluates the same code over
    fixed-size edge chunks so the volume never exceeds a few hundred MB
    (reference uses an on-the-fly CUDA kernel; on TPU a chunked MXU
    matmul is faster than scattered dot products).

All functions are jit-friendly with static shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def corr_volume(fmap1, fmap2):
    """All-pairs correlation.

    fmap: (E, H, W, C). Returns (E, H*W, H, W) fp32 volume, scaled by
    1/16 like the reference (corr.py:63-71).
    """
    E, H, W, C = fmap1.shape
    f1 = fmap1.reshape(E, H * W, C).astype(jnp.float32) / 4.0
    f2 = fmap2.reshape(E, H * W, C).astype(jnp.float32) / 4.0
    vol = jnp.einsum("epc,eqc->epq", f1, f2,
                     preferred_element_type=jnp.float32)
    return vol.reshape(E, H * W, H, W)


def _avg_pool2(x):
    """2x2/stride-2 average pool over the last two dims of (E,P,H,W);
    odd trailing rows/cols are dropped (torch avg_pool2d semantics)."""
    E, P, H, W = x.shape
    H2, W2 = H // 2, W // 2
    x = x[:, :, :2 * H2, :2 * W2].reshape(E, P, H2, 2, W2, 2)
    return x.mean(axis=(3, 5))


def build_pyramid(fmap1, fmap2, num_levels=4):
    """Correlation pyramid: list of (E, HW, H/2^l, W/2^l) volumes."""
    vol = corr_volume(fmap1, fmap2)
    pyramid = [vol]
    for _ in range(num_levels - 1):
        vol = _avg_pool2(vol)
        pyramid.append(vol)
    return pyramid


def _lookup_level(vol, coords, radius):
    """Sample a (2r+1)^2 window from one pyramid level.

    vol: (E, HW1, H2, W2); coords: (E, HW1, 2) in this level's pixels.
    Returns (E, HW1, (2r+1)^2).
    """
    E, HW1, H2, W2 = vol.shape
    r = radius
    S = 2 * r + 2  # integer patch side (window + 1 for the bilinear blend)

    x, y = coords[..., 0], coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None, None]
    fy = (y - y0)[..., None, None]

    bx = x0.astype(jnp.int32) - r
    by = y0.astype(jnp.int32) - r

    # integer patch coordinates (E, HW1, S, S)
    dy = jnp.arange(S, dtype=jnp.int32)
    dx = jnp.arange(S, dtype=jnp.int32)
    ys = by[..., None, None] + dy[None, None, :, None]
    xs = bx[..., None, None] + dx[None, None, None, :]

    inb = ((ys >= 0) & (ys < H2) & (xs >= 0) & (xs < W2))
    ysc = jnp.clip(ys, 0, H2 - 1)
    xsc = jnp.clip(xs, 0, W2 - 1)
    flat_idx = (ysc * W2 + xsc).reshape(E, HW1, S * S)

    vol_flat = vol.reshape(E, HW1, H2 * W2)
    patch = jnp.take_along_axis(vol_flat, flat_idx, axis=2)
    patch = patch.reshape(E, HW1, S, S)
    patch = jnp.where(inb, patch, 0.0)

    # shared-fraction bilinear blend of 4 shifted (2r+1)^2 views
    w = 2 * r + 1
    p00 = patch[..., :w, :w]
    p01 = patch[..., :w, 1:]
    p10 = patch[..., 1:, :w]
    p11 = patch[..., 1:, 1:]
    out = ((1 - fy) * (1 - fx) * p00 + (1 - fy) * fx * p01 +
           fy * (1 - fx) * p10 + fy * fx * p11)
    # reference tap order is dx-MAJOR (corr_index_forward_kernel writes
    # corr[n][i][j] with i = x-offset, correlation_kernels.cu:46-66);
    # converted checkpoints' corr-encoder weights expect that layout
    out = jnp.swapaxes(out, -1, -2)
    return out.reshape(E, HW1, w * w)


def lookup(pyramid, coords, radius=3):
    """Sample correlation features at ``coords`` from every level.

    coords: (E, H, W, 2) level-0 target coordinates [x, y].
    Returns (E, H, W, num_levels*(2r+1)^2) — channel layout
    [level0 window, level1 window, ...] matching the reference's
    ``torch.cat(out_pyramid, dim=2)`` (corr.py:46-50).
    """
    E, H, W, _ = coords.shape
    c = coords.reshape(E, H * W, 2).astype(jnp.float32)
    outs = []
    for lvl, vol in enumerate(pyramid):
        outs.append(_lookup_level(vol, c / (2 ** lvl), radius))
    out = jnp.concatenate(outs, axis=-1)
    return out.reshape(E, H, W, -1)


def corr_and_lookup(fmap1, fmap2, coords, num_levels=4, radius=3):
    """Fused build + sample — used by the chunked low-memory global-BA
    path, where the volume for a chunk of edges is transient."""
    return lookup(build_pyramid(fmap1, fmap2, num_levels), coords, radius)


@functools.partial(jax.jit, static_argnames=("num_levels", "radius",
                                             "chunk"))
def chunked_corr_lookup(fmaps, ii, jj, coords, num_levels=4, radius=3,
                        chunk=8):
    """AltCorr equivalent: lookup over many edges without materializing
    all volumes at once (reference AltCorrBlock, corr.py:91-139).

    fmaps: (F, H, W, C) per-frame features. ii/jj: (E,) frame ids.
    coords: (E, H, W, 2). Evaluates in ``chunk``-edge blocks via
    lax.map so peak memory is one chunk's pyramid.
    """
    E, H, W, _ = coords.shape
    pad = (-E) % chunk
    iip = jnp.concatenate([ii, jnp.zeros(pad, ii.dtype)])
    jjp = jnp.concatenate([jj, jnp.zeros(pad, jj.dtype)])
    cp = jnp.concatenate(
        [coords, jnp.zeros((pad, H, W, 2), coords.dtype)], axis=0)

    n_chunks = (E + pad) // chunk
    iic = iip.reshape(n_chunks, chunk)
    jjc = jjp.reshape(n_chunks, chunk)
    cc = cp.reshape(n_chunks, chunk, H, W, 2)

    def one_chunk(args):
        i, j, c = args
        f1 = fmaps[i]
        f2 = fmaps[j]
        return corr_and_lookup(f1, f2, c, num_levels, radius)

    out = jax.lax.map(one_chunk, (iic, jjc, cc))
    out = out.reshape(n_chunks * chunk, H, W, -1)
    return out[:E]
