"""Field upsampling ops: learned convex upsampling and bilinear x8.

Rebuild of the reference's cvx_upsample / upsample_inter
(VO_Module/droid_slam/droid_net.py:23-61) in channels-last JAX. The
convex upsample composes a softmax over 3x3 neighborhoods with learned
8x8 sub-pixel weights; implemented with explicit shifted views (XLA fuses
these into one loop) instead of torch's ``F.unfold``. The bilinear x8
matches torch ``align_corners=True`` semantics exactly — both are part
of the bit-compat I/O contract for the VPS handoff.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _neighborhood9(x):
    """3x3 shifted views of (B, H, W, C) with zero padding ->
    (B, 9, H, W, C), ordered row-major like torch F.unfold."""
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    views = []
    for dy in range(3):
        for dx in range(3):
            views.append(xp[:, dy:dy + H, dx:dx + W, :])
    return jnp.stack(views, axis=1)


def cvx_upsample(data, mask):
    """Convex upsample of a field by 8x.

    data: (B, H, W, D); mask: (B, H, W, 9*8*8) logits.
    Returns (B, 8H, 8W, D). Matches reference droid_net.py:23-37.
    """
    B, H, W, D = data.shape
    m = mask.reshape(B, H, W, 9, 8, 8)
    m = jax.nn.softmax(m, axis=3)

    nbh = _neighborhood9(data)  # (B, 9, H, W, D)
    # weighted sum over the 9 taps for each of the 64 sub-pixels
    up = jnp.einsum("bkhwd,bhwkyx->bhywxd", nbh, m)
    return up.reshape(B, 8 * H, 8 * W, D)


def _resize_axis_align_corners(x, axis, out_size):
    in_size = x.shape[axis]
    if in_size == 1:
        reps = [1] * x.ndim
        reps[axis] = out_size
        return jnp.tile(x, reps)
    pos = jnp.arange(out_size, dtype=jnp.float32) * \
        ((in_size - 1) / (out_size - 1))
    i0 = jnp.floor(pos).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    f = (pos - i0.astype(jnp.float32))

    x0 = jnp.take(x, i0, axis=axis)
    x1 = jnp.take(x, i1, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    f = f.reshape(shape).astype(x.dtype)
    return x0 * (1 - f) + x1 * f


def bilinear_resize_align_corners(x, out_h, out_w):
    """Bilinear resize of (..., H, W, C) with torch align_corners=True
    semantics (grid endpoints map to endpoints)."""
    h_axis = x.ndim - 3
    w_axis = x.ndim - 2
    x = _resize_axis_align_corners(x, h_axis, out_h)
    x = _resize_axis_align_corners(x, w_axis, out_w)
    return x


def upsample_inter(field, factor=8):
    """Bilinear x8 upsample of (..., H, W, D) fields; equivalent to the
    reference's F.interpolate(align_corners=True) (droid_net.py:54-61)."""
    H, W = field.shape[-3], field.shape[-2]
    return bilinear_resize_align_corners(field, factor * H, factor * W)
