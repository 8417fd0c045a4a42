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
                    gt_masks=None, max_props=256, pre_nms_topk=1000,
                    rng=None):
    """Full loss stack for one image: RPN objectness + box regression,
    Fast R-CNN classification + class-specific box regression, mask BCE
    on foreground proposals, and semseg CE — the detectron2 loss set
    the reference trains panFPN.pth with (VPS_Module/detectron2/
    modeling/meta_arch/panoptic_fpn.py:137-166 training branch;
    roi_heads/mask_head.py:21-60 for the mask term).

    gt_masks: optional (G, H, W) {0,1} instance bitmasks aligned with
    gt_boxes; when given, the mask-head loss is included.
    """
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
                              gt_valid, rng=rng)

    # --- ROI losses on proposals ---
    lg0 = {k: v[0] for k, v in obj_logits.items()}
    rg0 = {k: v[0] for k, v in deltas.items()}
    props, _, pvalid = generate_proposals(
        lg0, rg0, (H, W), pre_nms_topk=pre_nms_topk,
        post_nms_topk=max_props)
    # detectron2 detaches proposals before the ROI heads
    # (proposal_generator/proposal_utils.py find_top_rpn_proposals)
    props = jax.lax.stop_gradient(props)
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
    metrics = {"rpn_obj": obj_l, "rpn_loc": loc_l, "cls": cls_l,
               "box_loc": bloc_l, "sem_seg": sem_l}

    # --- mask head on foreground proposals (mask_head.py:21-60) ---
    if gt_masks is not None:
        K = model.num_thing_classes
        mpooled = multilevel_roi_align(feats, props, out_size=14)
        mlogits = model.apply(
            params, mpooled,
            method=lambda m, x: m.roi_heads.mask_head(x))  # (R,28,28,K)
        tgt_cls = jnp.clip(gt_classes[best_gt], 0, K - 1)
        sel = jnp.take_along_axis(
            mlogits, tgt_cls[:, None, None, None], axis=-1)[..., 0]
        gt28 = L.crop_and_resize_masks(gt_masks, best_gt, props)
        mask_l = L.mask_loss(sel, fg, gt28)
        total = total + mask_l
        metrics["mask"] = mask_l

    return total, metrics


def make_fusion_train_step(model: PanopticFPN, tx, **loss_kw):
    """Jitted fusion-finetune step on (ref, cur) pairs.

    batch: dict with cur_image (1,H,W,3), ref_image, flow (H,W,2),
    gt_boxes (G,4), gt_classes (G,), gt_valid (G,), sem_labels (1,H,W),
    optional gt_masks (G,H,W).
    """

    def step(state: TrainState, batch):
        rng = jax.random.fold_in(jax.random.PRNGKey(17), state.step)

        def loss_fn(p):
            feats_ref = model.apply(p, batch["ref_image"],
                                    method="features")
            warped = flow_warp_features(feats_ref, batch["flow"])
            return panoptic_losses(
                model, p, batch["cur_image"], warped,
                batch["gt_boxes"], batch["gt_classes"],
                batch["gt_valid"], batch["sem_labels"],
                gt_masks=batch.get("gt_masks"), rng=rng, **loss_kw)

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(params, opt_state, state.step + 1),
                {"loss": loss, **metrics})

    return jax.jit(step, donate_argnums=(0,))


def _decay_mask(params):
    """detectron2's build_optimizer exempts normalization parameters
    from weight decay (cfg.SOLVER.WEIGHT_DECAY_NORM = 0.0): decay only
    leaves whose path does not pass through a norm module."""
    def walk(tree, under_norm=False):
        if isinstance(tree, dict):
            return {k: walk(v, under_norm or "norm" in k.lower())
                    for k, v in tree.items()}
        return not under_norm
    return walk(params)


def make_solver(base_lr=2.5e-4, max_iter=90000, warmup_iters=1000,
                warmup_factor=1e-3, steps=(60000, 80000), gamma=0.1,
                momentum=0.9, weight_decay=1e-4, clip=None,
                params=None):
    """detectron2 default solver: SGD + momentum + weight decay with
    WarmupMultiStepLR (reference VPS_Module/detectron2/solver/build.py
    build_optimizer + build_lr_scheduler; cfg.SOLVER defaults).

    ``params``: pass the parameter tree to exempt norm scales/biases
    from weight decay like the reference (WEIGHT_DECAY_NORM = 0.0);
    without it every leaf decays. ``clip``: the reference ships with
    gradient clipping DISABLED (CLIP_GRADIENTS.ENABLED = False) — pass
    a norm to enable it."""
    def sched(count):
        lr = base_lr
        for s in steps:
            lr = jnp.where(count >= s, lr * gamma, lr)
        warm = warmup_factor + (1.0 - warmup_factor) * \
            jnp.minimum(count.astype(jnp.float32), warmup_iters) / \
            max(warmup_iters, 1)
        return lr * warm

    if params is not None:
        wd = optax.masked(optax.add_decayed_weights(weight_decay),
                          _decay_mask(params))
    else:
        wd = optax.add_decayed_weights(weight_decay)

    parts = [wd,
             optax.trace(decay=momentum),
             optax.scale_by_schedule(lambda c: -sched(c))]
    if clip is not None:
        parts.insert(0, optax.clip_by_global_norm(clip))
    return optax.chain(*parts)


def make_full_train_step(model: PanopticFPN, tx, **loss_kw):
    """Jitted FULL-MODEL Panoptic-FPN train step (every head learns:
    backbone, FPN, RPN, box/mask heads, semseg) — the training mode the
    reference uses to produce panFPN.pth from scratch
    (VPS_Module/tools/train_net.py:94-131, DefaultTrainer over
    PanopticFPN training losses).

    batch: image (1,H,W,3), gt_boxes (G,4), gt_classes (G,),
    gt_valid (G,), sem_labels (1,H,W), gt_masks (G,H,W).
    """

    def step(state: TrainState, batch):
        # per-step RPN anchor-subsample randomness (detectron2 draws
        # a fresh 256-anchor sample every iteration)
        rng = jax.random.fold_in(jax.random.PRNGKey(17), state.step)

        def loss_fn(p):
            return panoptic_losses(
                model, p, batch["image"], None,
                batch["gt_boxes"], batch["gt_classes"],
                batch["gt_valid"], batch["sem_labels"],
                gt_masks=batch.get("gt_masks"), rng=rng, **loss_kw)

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(params, opt_state, state.step + 1),
                {"loss": loss, **metrics})

    return jax.jit(step, donate_argnums=(0,))


def make_full_train_step_dp(model: PanopticFPN, tx, mesh, **loss_kw):
    """Data-parallel full-model step: batch leaves carry a leading
    device-batch axis sharded over the mesh's ``data`` axis, params
    replicated; XLA inserts the gradient all-reduce over ICI (replaces
    the reference's detectron2 DDP/NCCL launch, engine/launch.py:27-84).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    def step(state: TrainState, batch):
        rng = jax.random.fold_in(jax.random.PRNGKey(17), state.step)

        def loss_fn(p):
            def one(sample):
                return panoptic_losses(
                    model, p, sample["image"], None,
                    sample["gt_boxes"], sample["gt_classes"],
                    sample["gt_valid"], sample["sem_labels"],
                    gt_masks=sample.get("gt_masks"), rng=rng,
                    **loss_kw)
            loss, metrics = jax.vmap(one)(batch)
            return jnp.mean(loss), jax.tree.map(jnp.mean, metrics)

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(params, opt_state, state.step + 1),
                {"loss": loss, **metrics})

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(step, donate_argnums=(0,)), data, repl


def dryrun_dp(n_devices=None, H=64, W=96):
    """Compile + run ONE data-parallel full-model VPS train step on an
    n_devices mesh at tiny shapes (driver multi-chip validation;
    VO counterpart: parallel/data_parallel.dryrun). Returns metrics."""
    from jax.sharding import Mesh

    devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    mesh = Mesh(np.asarray(devices), ("data",))
    n = len(devices)

    key = jax.random.PRNGKey(0)
    model = PanopticFPN(backbone_blocks=(1, 1, 1, 1))

    # H, W must be divisible by the FPN's largest stride (32)
    masks = np.zeros((4, H, W), np.float32)
    masks[0, 4:20, 4:20] = 1.0
    masks[1, 6:24, 10:30] = 1.0
    one = {
        "image": jax.random.normal(key, (1, H, W, 3)) * 20 + 90,
        "gt_boxes": jnp.asarray(
            [[4., 4., 20., 20.], [10., 6., 30., 24.],
             [0., 0., 1., 1.], [0., 0., 1., 1.]]),
        "gt_classes": jnp.asarray([1, 2, 0, 0]),
        "gt_valid": jnp.asarray([True, True, False, False]),
        "sem_labels": jnp.ones((1, H, W), jnp.int32) * 3,
        "gt_masks": jnp.asarray(masks),
    }

    params = model.init(key, one["image"])
    tx = make_solver(base_lr=1e-3)
    state = TrainState(params, tx.init(params),
                       jnp.zeros((), jnp.int32))
    step, data_sh, repl_sh = make_full_train_step_dp(
        model, tx, mesh, max_props=32, pre_nms_topk=64)

    batch = jax.tree.map(
        lambda x: jax.device_put(
            jnp.broadcast_to(x[None], (n,) + x.shape), data_sh), one)
    state = jax.tree.map(lambda x: jax.device_put(x, repl_sh), state)
    state, metrics = step(state, batch)
    jax.block_until_ready(state.params)
    return {k: float(v) for k, v in metrics.items()}
