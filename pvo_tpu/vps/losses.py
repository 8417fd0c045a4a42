"""Detection / segmentation training losses, static-shape JAX.

Rebuild of the detectron2 loss stack the reference trains with
(VPS_Module/detectron2/modeling/proposal_generator/rpn.py,
roi_heads/fast_rcnn.py, mask_head.py, meta_arch/semantic_seg.py):
RPN objectness BCE + box regression, Fast R-CNN classification +
class-specific box regression, mask BCE, and semantic-segmentation
cross-entropy with ignore label. Matching and subsampling are
reformulated as fixed-size masked computations (no dynamic shapes):
instead of drawing a random 256-anchor subsample we weight by the
matched masks and normalize by the (clamped) positive count — the
expected-loss equivalent of detectron2's sampling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import ops

IGNORE_LABEL = 255


def smooth_l1(x, beta=0.0):
    ax = jnp.abs(x)
    if beta <= 0:
        return ax
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def match_anchors(anchors, gt_boxes, gt_valid, pos_thresh=0.7,
                  neg_thresh=0.3):
    """IoU matcher (detectron2 Matcher semantics with
    allow_low_quality_matches): returns (matched_idx (A,), labels (A,))
    with labels 1=pos, 0=neg, -1=ignore."""
    iou = ops.box_iou(anchors, gt_boxes)              # (A, G)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)

    labels = jnp.where(best_iou >= pos_thresh, 1,
                       jnp.where(best_iou < neg_thresh, 0, -1))
    # low-quality matches: each gt's best anchor is positive
    best_anchor_per_gt = jnp.max(iou, axis=0)         # (G,)
    is_best = jnp.any(
        (iou >= best_anchor_per_gt[None, :] - 1e-6) & (iou > 0) &
        gt_valid[None, :], axis=1)
    labels = jnp.where(is_best, 1, labels)
    return best_gt, labels


def subsample_labels(labels, rng, num_samples=256, pos_fraction=0.5):
    """detectron2 sampling.py subsample_labels in static-shape JAX:
    pick min(#pos, num*frac) random positives and fill the remainder
    with random negatives. Returns (sel_pos, sel_neg) boolean masks.

    Selection-by-rank: every anchor draws a uniform priority; an
    anchor is selected iff its rank among its class (by priority) is
    below the (traced) class quota — two argsorts give the ranks with
    static shapes."""
    r = jax.random.uniform(rng, labels.shape)
    pos = labels == 1
    neg = labels == 0
    n_pos = jnp.minimum(jnp.sum(pos), int(num_samples * pos_fraction))
    n_neg = jnp.minimum(jnp.sum(neg), num_samples - n_pos)
    pos_rank = jnp.argsort(jnp.argsort(jnp.where(pos, r, jnp.inf)))
    neg_rank = jnp.argsort(jnp.argsort(jnp.where(neg, r, jnp.inf)))
    return pos & (pos_rank < n_pos), neg & (neg_rank < n_neg)


def rpn_loss(anchors, obj_logits, deltas, gt_boxes, gt_valid,
             rng=None, norm_count=256.0):
    """anchors (A,4), obj_logits (A,), deltas (A,4);
    gt_boxes (G,4) padded with gt_valid mask.

    detectron2 semantics (rpn.py losses + _subsample_labels): BOTH
    terms run on a 256-anchor random subsample (<=50% positive),
    normalized by 256 — summing objectness over ALL anchors is only
    numerically similar at toy geometries; at 384x1248 (~270k
    anchors) it reaches ~4e6 and the first SGD step NaNs the params
    (found by scripts/bench_vps_train.py round 5)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    matched, labels = match_anchors(anchors, gt_boxes, gt_valid)
    sel_pos, sel_neg = subsample_labels(labels, rng)
    pos = sel_pos.astype(jnp.float32)
    neg = sel_neg.astype(jnp.float32)

    tgt = ops.encode_boxes(anchors, gt_boxes[matched])
    # where (not multiply): degenerate matches give inf targets and
    # 0 * inf = NaN would poison the sum
    loc = jnp.sum(jnp.where(pos[:, None] > 0,
                            smooth_l1(deltas - tgt), 0.0)) / norm_count

    logp = jax.nn.log_sigmoid(obj_logits)
    logn = jax.nn.log_sigmoid(-obj_logits)
    obj = -(pos * logp + neg * logn)
    obj = jnp.sum(obj) / norm_count
    return obj, loc


def fast_rcnn_loss(proposals, prop_valid, scores, deltas, gt_boxes,
                   gt_classes, gt_valid, num_classes,
                   fg_thresh=0.5):
    """scores (R, K+1), deltas (R, K*4). Background = class K."""
    iou = ops.box_iou(proposals, gt_boxes)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)
    fg = (best_iou >= fg_thresh) & prop_valid
    tgt_cls = jnp.where(fg, gt_classes[best_gt], num_classes)

    logits = jax.nn.log_softmax(scores, axis=-1)
    ce = -jnp.take_along_axis(logits, tgt_cls[:, None], axis=1)[:, 0]
    ce = jnp.sum(jnp.where(prop_valid, ce, 0.0)) / \
        jnp.maximum(jnp.sum(prop_valid), 1)

    tgt_deltas = ops.encode_boxes(proposals, gt_boxes[best_gt],
                                  weights=(10.0, 10.0, 5.0, 5.0))
    d = deltas.reshape(-1, num_classes, 4)
    d_sel = jnp.take_along_axis(
        d, jnp.clip(tgt_cls, 0, num_classes - 1)[:, None, None]
        .repeat(4, -1), axis=1)[:, 0]
    loc = jnp.sum(jnp.where(fg[:, None],
                            smooth_l1(d_sel - tgt_deltas), 0.0)) / \
        jnp.maximum(jnp.sum(prop_valid), 1)
    return ce, loc, fg, best_gt


def crop_and_resize_masks(gt_masks, gt_idx, boxes, out_size=28,
                          samples=2):
    """Crop each proposal's matched GT bitmask to its box at
    out_size x out_size (reference BitMasks.crop_and_resize —
    VPS_Module/detectron2/structures/masks.py — ROIAlign aligned=True
    on the mask, then >= 0.5 binarization in mask_rcnn_loss).

    gt_masks (G, H, W) {0,1}; gt_idx (R,) matched gt per proposal;
    boxes (R, 4) image coords. Returns (R, out, out) float {0,1}.
    """
    G, H, W = gt_masks.shape
    R = boxes.shape[0]
    f = jnp.float32
    b = boxes.astype(f) - 0.5                   # aligned=True shift
    x0, y0, x1, y1 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    bw = (x1 - x0) / out_size
    bh = (y1 - y0) / out_size

    ix = jnp.arange(out_size, dtype=f)
    sx = (jnp.arange(samples, dtype=f) + 0.5) / samples
    gx = (x0[:, None, None] + (ix[None, :, None] + sx[None, None, :]) *
          bw[:, None, None]).reshape(R, -1)     # (R, out*s)
    gy = (y0[:, None, None] + (ix[None, :, None] + sx[None, None, :]) *
          bh[:, None, None]).reshape(R, -1)

    flat = gt_masks.reshape(G, H * W).astype(f)
    ys = gy[:, :, None]                          # (R, os, 1)
    xs = gx[:, None, :]                          # (R, 1, os)
    y0f = jnp.floor(ys)
    x0f = jnp.floor(xs)
    fy = ys - y0f
    fx = xs - x0f

    def g(yi, xi):
        inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        idx = yc * W + xc                        # (R, os, os)
        return flat[gt_idx[:, None, None], idx] * inb

    vals = ((1 - fy) * (1 - fx) * g(y0f, x0f) +
            (1 - fy) * fx * g(y0f, x0f + 1) +
            fy * (1 - fx) * g(y0f + 1, x0f) +
            fy * fx * g(y0f + 1, x0f + 1))       # (R, os, os)
    s = samples
    vals = vals.reshape(R, out_size, s, out_size, s).mean((2, 4))
    return (vals >= 0.5).astype(f)


def mask_loss(mask_logits, fg, gt_masks_28):
    """mask_logits (R, 28, 28) for the target class; gt_masks_28
    (R, 28, 28) in {0,1} cropped to the proposal."""
    p = mask_logits
    y = gt_masks_28
    bce = jnp.maximum(p, 0) - p * y + jnp.log1p(jnp.exp(-jnp.abs(p)))
    per = jnp.mean(bce, axis=(1, 2))
    return jnp.sum(jnp.where(fg, per, 0.0)) / \
        jnp.maximum(jnp.sum(fg), 1)


def semseg_loss(logits, labels, ignore=IGNORE_LABEL, weight=0.5):
    """logits (B, H, W, S); labels (B, H, W) int with ignore."""
    valid = labels != ignore
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return weight * jnp.sum(jnp.where(valid, ce, 0.0)) / \
        jnp.maximum(jnp.sum(valid), 1)
