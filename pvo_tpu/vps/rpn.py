"""Region Proposal Network, static-shape JAX.

Rebuild of detectron2's RPN (reference VPS_Module/detectron2/modeling/
proposal_generator/rpn.py:181): shared 3x3 conv head with objectness +
anchor-delta 1x1 convs over p2..p6, anchor generation (sizes 32..512,
aspects 0.5/1/2), per-level top-k pre-NMS, joint NMS, fixed-size
proposal output.
"""

from __future__ import annotations

import math
from typing import Dict, List

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from pvo_tpu.vo.net.layers import Conv

from . import ops

LEVELS = ("p2", "p3", "p4", "p5", "p6")
STRIDES = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64}
SIZES = {"p2": 32, "p3": 64, "p4": 128, "p5": 256, "p6": 512}
ASPECTS = (0.5, 1.0, 2.0)


def generate_anchors(level, hw):
    """Anchor boxes (H*W*A, 4) for a feature level of shape hw."""
    stride = STRIDES[level]
    size = SIZES[level]
    h, w = hw
    anchors = []
    area = float(size * size)
    for a in ASPECTS:
        aw = math.sqrt(area / a)
        ah = a * aw
        anchors.append([-aw / 2, -ah / 2, aw / 2, ah / 2])
    base = np.asarray(anchors, np.float32)  # (A, 4)

    ys = (np.arange(h, dtype=np.float32)) * stride
    xs = (np.arange(w, dtype=np.float32)) * stride
    gx, gy = np.meshgrid(xs, ys)
    shifts = np.stack([gx, gy, gx, gy], axis=-1).reshape(-1, 1, 4)
    return jnp.asarray((shifts + base[None]).reshape(-1, 4))


class RPNHead(nn.Module):
    num_anchors: int = len(ASPECTS)

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray]):
        conv = Conv(256, 3, name="conv")
        obj = Conv(self.num_anchors, 1, padding=0, name="objectness")
        deltas = Conv(4 * self.num_anchors, 1, padding=0,
                      name="anchor_deltas")
        logits, regs = {}, {}
        for lvl in LEVELS:
            t = nn.relu(conv(feats[lvl]))
            logits[lvl] = obj(t)
            regs[lvl] = deltas(t)
        return logits, regs


def generate_proposals(logits, regs, image_hw, pre_nms_topk=1000,
                       post_nms_topk=1000, nms_thresh=0.7,
                       min_size=0.0):
    """Decode + NMS proposals for ONE image.

    logits: {lvl: (h, w, A)}; regs: {lvl: (h, w, 4A)}.
    Returns (boxes (post_nms_topk, 4), scores, valid).
    """
    H, W = image_hw
    all_boxes, all_scores = [], []
    for lvl in LEVELS:
        lg = logits[lvl].reshape(-1)
        h, w, _ = logits[lvl].shape
        rg = regs[lvl].reshape(h * w, len(ASPECTS), 4).reshape(-1, 4)
        anchors = generate_anchors(lvl, (h, w))

        k = min(pre_nms_topk, lg.shape[0])
        top_scores, idx = jax.lax.top_k(lg, k)
        boxes = ops.decode_boxes(rg[idx], anchors[idx])
        boxes = ops.clip_boxes(boxes, H, W)

        ok = ((boxes[:, 2] - boxes[:, 0] > min_size) &
              (boxes[:, 3] - boxes[:, 1] > min_size))
        all_boxes.append(boxes)
        all_scores.append(jnp.where(ok, top_scores, -jnp.inf))

    boxes = jnp.concatenate(all_boxes, 0)
    scores = jnp.concatenate(all_scores, 0)
    keep, valid = ops.nms(boxes, scores, nms_thresh, post_nms_topk)
    return boxes[keep], scores[keep], valid
