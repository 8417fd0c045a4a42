"""VPS training: fusion-conv finetune and full-model train steps.

Rebuild of the reference's VPS training setup (VPS_Module/tools/
train_net.py + the fusion mode of panoptic_fpn.py:75-100, which freezes
every parameter except ``fusion_conv1``): a jitted train step computing
the Panoptic-FPN loss stack (RPN + Fast R-CNN + mask + semseg) on
(ref, cur) frame pairs with flow-warped reference features, with an
optax-masked optimizer so only the fusion conv moves in fusion mode.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from . import losses as L
from . import ops
from .panoptic_fpn import PanopticFPN, flow_warp_features
from .rpn import LEVELS, generate_anchors, generate_proposals


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def fusion_param_mask(params):
    """optax mask: True only for fusion_conv1 leaves."""
    def mask(tree, under_fusion=False):
        if isinstance(tree, dict):
            return {k: mask(v, under_fusion or k == "fusion_conv1")
                    for k, v in tree.items()}
        return under_fusion
    return mask(params)


def make_fusion_optimizer(params, lr=2.5e-4):
    """SGD-with-momentum on fusion_conv1 only (detectron2 default
    solver, frozen elsewhere like the reference fusion mode).

    Note optax.masked leaves UNMASKED updates untouched (they would be
    applied as raw gradients), so the complement must be explicitly
    zeroed."""
    mask = fusion_param_mask(params)
    inv_mask = jax.tree.map(lambda m: not m, mask)
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.sgd(lr, momentum=0.9),
    )
    return optax.chain(
        optax.masked(optax.set_to_zero(), inv_mask),
        optax.masked(tx, mask),
    )


def panoptic_losses(model: PanopticFPN, params, image_bgr, feats_warp,
                    gt_boxes, gt_classes, gt_valid, sem_labels,
                    max_props=256):
    """Full loss stack for one image."""
    H, W = image_bgr.shape[1:3]

    def fwd(p):
        feats = model.apply(p, image_bgr, method="features")
        if feats_warp is not None:
            feats = model.apply(p, feats, feats_warp, method="fuse")
        sem_logits = model.apply(
            p, feats, (H, W),
            method=lambda m, f, hw: m.sem_seg_head(f, hw))
        obj_logits, deltas = model.apply(
            p, feats, method=lambda m, f: m.rpn_head(f))
        return feats, sem_logits, obj_logits, deltas

    feats, sem_logits, obj_logits, deltas = fwd(params)

    # --- RPN losses over all anchors ---
    anchors, lg, rg = [], [], []
    for lvl in LEVELS:
        h, w = obj_logits[lvl].shape[1:3]
        anchors.append(generate_anchors(lvl, (h, w)))
        lg.append(obj_logits[lvl][0].reshape(-1))
        rg.append(deltas[lvl][0].reshape(-1, 4))
    anchors = jnp.concatenate(anchors, 0)
    obj_l, loc_l = L.rpn_loss(anchors, jnp.concatenate(lg, 0),
                              jnp.concatenate(rg, 0), gt_boxes,
                              gt_valid)

    # --- ROI losses on proposals ---
    lg0 = {k: v[0] for k, v in obj_logits.items()}
    rg0 = {k: v[0] for k, v in deltas.items()}
    props, _, pvalid = generate_proposals(
        lg0, rg0, (H, W), post_nms_topk=max_props)
    # include GT boxes as proposals (detectron2 add_gt_proposals)
    G = gt_boxes.shape[0]
    props = jnp.concatenate([props[:-G], gt_boxes], 0)
    pvalid = jnp.concatenate([pvalid[:-G], gt_valid], 0)

    from .roi_heads import multilevel_roi_align
    pooled = multilevel_roi_align(feats, props, out_size=7)
    scores, box_deltas = model.apply(
        params, pooled, method=lambda m, x: m.roi_heads.box_head(x))
    cls_l, bloc_l, fg, best_gt = L.fast_rcnn_loss(
        props, pvalid, scores, box_deltas, gt_boxes, gt_classes,
        gt_valid, model.num_thing_classes)

    # --- semseg ---
    sem_l = L.semseg_loss(sem_logits, sem_labels)

    total = obj_l + loc_l + cls_l + bloc_l + sem_l
    return total, {"rpn_obj": obj_l, "rpn_loc": loc_l, "cls": cls_l,
                   "box_loc": bloc_l, "sem_seg": sem_l}


def make_fusion_train_step(model: PanopticFPN, tx):
    """Jitted fusion-finetune step on (ref, cur) pairs.

    batch: dict with cur_image (1,H,W,3), ref_image, flow (H,W,2),
    gt_boxes (G,4), gt_classes (G,), gt_valid (G,), sem_labels (1,H,W).
    """

    def step(state: TrainState, batch):
        def loss_fn(p):
            feats_ref = model.apply(p, batch["ref_image"],
                                    method="features")
            warped = flow_warp_features(feats_ref, batch["flow"])
            return panoptic_losses(
                model, p, batch["cur_image"], warped,
                batch["gt_boxes"], batch["gt_classes"],
                batch["gt_valid"], batch["sem_labels"])

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(params, opt_state, state.step + 1),
                {"loss": loss, **metrics})

    return jax.jit(step, donate_argnums=(0,))
