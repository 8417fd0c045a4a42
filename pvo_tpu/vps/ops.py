"""Detection ops: boxes, NMS, ROIAlign — static-shape JAX.

TPU-native equivalents of the reference's native detection kernels
(VPS_Module/detectron2/layers/csrc + torchvision ROIAlign/NMS, see
SURVEY.md P8):

  * ``roi_align``: bilinear ROI pooling on a feature level with the
    detectron2 aligned=True half-pixel convention; a fixed 2x2 sampling
    grid per output bin (the TPU-standard static approximation of the
    adaptive sampling_ratio=0; documented delta);
  * ``nms``: O(N^2) greedy suppression via lax.fori_loop over a
    score-sorted fixed-size box set — on TPU the (N,N) IoU matrix is one
    batched op and the loop is N scalar steps, far cheaper than a
    host round-trip;
  * box transforms matching detectron2's Box2BoxTransform (weights,
    clamped dw/dh).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

BBOX_XFORM_CLIP = math.log(1000.0 / 16)


def encode_boxes(src, target, weights=(1.0, 1.0, 1.0, 1.0)):
    """Box2BoxTransform.get_deltas (src=anchors/proposals)."""
    wx, wy, ww, wh = weights
    sw = src[..., 2] - src[..., 0]
    sh = src[..., 3] - src[..., 1]
    sx = src[..., 0] + 0.5 * sw
    sy = src[..., 1] + 0.5 * sh
    tw = target[..., 2] - target[..., 0]
    th = target[..., 3] - target[..., 1]
    tx = target[..., 0] + 0.5 * tw
    ty = target[..., 1] + 0.5 * th
    return jnp.stack([
        wx * (tx - sx) / sw, wy * (ty - sy) / sh,
        ww * jnp.log(tw / sw), wh * jnp.log(th / sh)], axis=-1)


def decode_boxes(deltas, boxes, weights=(1.0, 1.0, 1.0, 1.0)):
    """Box2BoxTransform.apply_deltas."""
    wx, wy, ww, wh = weights
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h

    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.minimum(deltas[..., 2] / ww, BBOX_XFORM_CLIP)
    dh = jnp.minimum(deltas[..., 3] / wh, BBOX_XFORM_CLIP)

    pcx = dx * w + cx
    pcy = dy * h + cy
    pw = jnp.exp(dw) * w
    ph = jnp.exp(dh) * h
    return jnp.stack([pcx - 0.5 * pw, pcy - 0.5 * ph,
                      pcx + 0.5 * pw, pcy + 0.5 * ph], axis=-1)


def clip_boxes(boxes, height, width):
    x0 = jnp.clip(boxes[..., 0], 0, width)
    y0 = jnp.clip(boxes[..., 1], 0, height)
    x1 = jnp.clip(boxes[..., 2], 0, width)
    y1 = jnp.clip(boxes[..., 3], 0, height)
    return jnp.stack([x0, y0, x1, y1], axis=-1)


def box_area(boxes):
    return jnp.maximum(boxes[..., 2] - boxes[..., 0], 0) * \
        jnp.maximum(boxes[..., 3] - boxes[..., 1], 0)


def box_iou(a, b):
    """IoU matrix (N, M) for (N,4) x (M,4)."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def nms(boxes, scores, iou_threshold, max_out):
    """Greedy NMS. Returns (keep_indices (max_out,), keep_valid).

    Boxes with score -inf are ignored. Indices refer to the input
    order; padded outputs carry index 0 with valid=False.
    """
    N = boxes.shape[0]
    order = jnp.argsort(-scores)
    b = boxes[order]
    s = scores[order]
    iou = box_iou(b, b)

    def body(i, alive):
        # if box i is still alive, kill all lower-scored overlapping
        kill = (iou[i] > iou_threshold) & \
            (jnp.arange(N) > i) & alive[i]
        return alive & ~kill

    alive = jnp.ones(N, bool) & jnp.isfinite(s)
    alive = jax.lax.fori_loop(0, N, body, alive)

    # select up to max_out surviving, in score order
    rank = jnp.cumsum(alive.astype(jnp.int32)) - 1
    sel = jnp.where(alive & (rank < max_out), rank, max_out)
    keep = jnp.full(max_out + 1, -1, jnp.int32).at[sel].set(
        jnp.arange(N, dtype=jnp.int32))[:max_out]
    valid = keep >= 0
    keep = jnp.where(valid, keep, 0)
    return order[keep], valid


def batched_nms(boxes, scores, class_ids, iou_threshold, max_out):
    """Per-class NMS via the coordinate-offset trick."""
    max_coord = jnp.max(boxes) + 1.0
    offsets = class_ids.astype(boxes.dtype)[:, None] * max_coord
    return nms(boxes + offsets, scores, iou_threshold, max_out)


def roi_align(features, boxes, out_size=7, spatial_scale=1.0,
              samples=2):
    """ROIAlign (aligned=True) on one feature map.

    features: (H, W, C); boxes: (R, 4) in image coords.
    Returns (R, out_size, out_size, C).
    """
    H, W, C = features.shape
    R = boxes.shape[0]

    b = boxes * spatial_scale - 0.5  # aligned=True half-pixel shift
    x0, y0, x1, y1 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    bw = (x1 - x0) / out_size
    bh = (y1 - y0) / out_size

    # sample grid: (R, out, samples) positions per axis
    ix = jnp.arange(out_size, dtype=features.dtype)
    sx = (jnp.arange(samples, dtype=features.dtype) + 0.5) / samples
    gx = (x0[:, None, None] + (ix[None, :, None] + sx[None, None, :]) *
          bw[:, None, None])                       # (R, out, s)
    gy = (y0[:, None, None] + (ix[None, :, None] + sx[None, None, :]) *
          bh[:, None, None])

    xs = gx.reshape(R, -1)                         # (R, out*s)
    ys = gy.reshape(R, -1)

    # bilinear gather over the full grid of (y, x) pairs
    def bilinear(ys_, xs_):
        y0f = jnp.floor(ys_)
        x0f = jnp.floor(xs_)
        fy = (ys_ - y0f)[..., None]
        fx = (xs_ - x0f)[..., None]

        def g(yi, xi):
            inb = ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W))
            yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
            xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
            vals = features.reshape(H * W, C)[
                (yc * W + xc).reshape(-1)].reshape(yi.shape + (C,))
            return vals * inb[..., None]

        return ((1 - fy) * (1 - fx) * g(y0f, x0f) +
                (1 - fy) * fx * g(y0f, x0f + 1) +
                fy * (1 - fx) * g(y0f + 1, x0f) +
                fy * fx * g(y0f + 1, x0f + 1))

    # (R, out*s, out*s, C): outer product of y and x sample positions
    vals = bilinear(ys[:, :, None] + jnp.zeros_like(xs)[:, None, :],
                    xs[:, None, :] + jnp.zeros_like(ys)[:, :, None])
    vals = vals.reshape(R, out_size, samples, out_size, samples, C)
    return vals.mean(axis=(2, 4))
