"""VPS training: fusion finetune moves ONLY fusion_conv1; full-model
training reaches every head (incl. mask) and reduces the loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvo_tpu.vps.panoptic_fpn import PanopticFPN
from pvo_tpu.vps.train import (TrainState, fusion_param_mask,
                               make_fusion_optimizer,
                               make_fusion_train_step,
                               make_full_train_step, make_solver,
                               panoptic_losses)

H, W = 64, 96


@pytest.fixture(autouse=True, scope="module")
def _no_x64():
    """Full-model VPS graphs are compile/eager heavy; f32 suffices."""
    import jax as _jax
    _jax.config.update("jax_enable_x64", False)
    yield
    _jax.config.update("jax_enable_x64", True)


LOSS_KW = dict(max_props=64, pre_nms_topk=128)


def _gt_masks(G=4):
    m = np.zeros((G, H, W), np.float32)
    m[0, 8:40, 8:40] = 1.0
    m[1, 10:50, 20:60] = 1.0
    return jnp.asarray(m)


@pytest.mark.slow
def test_fusion_step_only_moves_fusion_conv():
    key = jax.random.PRNGKey(0)
    model = PanopticFPN(backbone_blocks=(1, 1, 1, 1))
    x = jax.random.normal(key, (1, H, W, 3)) * 20 + 90
    params = model.init(key, x)

    mask = fusion_param_mask(params)
    n_fusion = sum(np.asarray(m).sum() if not isinstance(m, bool)
                   else int(m)
                   for m in jax.tree.leaves(mask))
    assert n_fusion >= 2  # kernel + bias

    tx = make_fusion_optimizer(params, lr=1e-2)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = make_fusion_train_step(model, tx, **LOSS_KW)

    G = 4
    batch = {
        "cur_image": x,
        "ref_image": x + 1.0,
        "flow": jnp.zeros((H, W, 2)),
        "gt_boxes": jnp.asarray(
            [[8., 8., 40., 40.], [20., 10., 60., 50.],
             [0., 0., 1., 1.], [0., 0., 1., 1.]]),
        "gt_classes": jnp.asarray([1, 2, 0, 0]),
        "gt_valid": jnp.asarray([True, True, False, False]),
        "sem_labels": jnp.ones((1, H, W), jnp.int32) * 3,
        "gt_masks": _gt_masks(),
    }
    params_before = jax.device_get(params)  # step donates its state
    with jax.disable_jit():
        new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))

    # only fusion_conv1 changed
    flat_old = jax.tree_util.tree_flatten_with_path(params_before)[0]
    flat_new = jax.tree_util.tree_flatten_with_path(new_state.params)[0]
    for (path, old), (_, new) in zip(flat_old, flat_new):
        names = [getattr(p, "key", "") for p in path]
        changed = bool(jnp.any(old != new))
        if "fusion_conv1" in names:
            assert changed, names
        else:
            assert not changed, names


def _full_batch(key):
    x = jax.random.normal(key, (1, H, W, 3)) * 20 + 90
    return {
        "image": x,
        "gt_boxes": jnp.asarray(
            [[8., 8., 40., 40.], [20., 10., 60., 50.],
             [0., 0., 1., 1.], [0., 0., 1., 1.]]),
        "gt_classes": jnp.asarray([1, 2, 0, 0]),
        "gt_valid": jnp.asarray([True, True, False, False]),
        "sem_labels": jnp.ones((1, H, W), jnp.int32) * 3,
        "gt_masks": _gt_masks(),
    }


@pytest.mark.slow
def test_full_train_gradients_reach_every_head():
    """Gradient flows to backbone, FPN, RPN, box head, MASK head and
    semseg head (VERDICT #3 done-criterion)."""
    key = jax.random.PRNGKey(1)
    model = PanopticFPN(backbone_blocks=(1, 1, 1, 1))
    batch = _full_batch(key)
    params = model.init(key, batch["image"])

    def loss_fn(p):
        total, metrics = panoptic_losses(
            model, p, batch["image"], None, batch["gt_boxes"],
            batch["gt_classes"], batch["gt_valid"],
            batch["sem_labels"], gt_masks=batch["gt_masks"],
            **LOSS_KW)
        return total, metrics

    # eager: one full-model XLA grad compile takes tens of minutes on
    # this 1-core CPU; correctness needs no jit
    with jax.disable_jit():
        (total, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
    assert "mask" in metrics and np.isfinite(float(metrics["mask"]))
    assert np.isfinite(float(total))

    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    touched = set()
    for path, g in flat:
        if float(jnp.max(jnp.abs(g))) > 0:
            touched.add("/".join(getattr(p, "key", "") for p in path))
    for part in ("backbone", "fpn", "rpn", "box_head", "mask_head",
                 "sem_seg"):
        assert any(part in t for t in touched), (part, sorted(touched))


@pytest.mark.slow
def test_full_train_two_steps_decrease_loss():
    key = jax.random.PRNGKey(2)
    model = PanopticFPN(backbone_blocks=(1, 1, 1, 1))
    batch = _full_batch(key)
    params = model.init(key, batch["image"])
    tx = make_solver(base_lr=1e-3, warmup_iters=0)
    state = TrainState(params, tx.init(params),
                       jnp.zeros((), jnp.int32))
    step = make_full_train_step(model, tx, **LOSS_KW)

    losses = []
    with jax.disable_jit():
        for _ in range(3):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses


def test_crop_and_resize_masks_alignment():
    """Box covering exactly the mask extent -> near-all-ones target;
    box over background -> zeros. (Fast, no model.)"""
    from pvo_tpu.vps.losses import crop_and_resize_masks

    gm = np.zeros((2, 32, 48), np.float32)
    gm[0, 8:24, 8:40] = 1.0
    gm = jnp.asarray(gm)
    boxes = jnp.asarray([[8., 8., 40., 24.],    # exactly the mask
                         [0., 0., 8., 8.]])     # background corner
    idx = jnp.asarray([0, 0])
    out = np.asarray(crop_and_resize_masks(gm, idx, boxes, out_size=8))
    assert out.shape == (2, 8, 8)
    assert out[0].mean() > 0.9, out[0]
    assert out[1].sum() == 0.0, out[1]


@pytest.mark.slow
def test_full_train_step_dp_8dev():
    """Mesh-sharded full-model VPS step executes on the virtual
    8-device CPU mesh (replaces reference DDP launch.py:27-84)."""
    from jax.sharding import Mesh

    from pvo_tpu.vps.train import make_full_train_step_dp

    n = len(jax.devices())
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    key = jax.random.PRNGKey(3)
    model = PanopticFPN(backbone_blocks=(1, 1, 1, 1))
    one = _full_batch(key)
    params = model.init(key, one["image"])
    tx = make_solver(base_lr=1e-3)
    state = TrainState(params, tx.init(params),
                       jnp.zeros((), jnp.int32))
    step, data_sh, repl_sh = make_full_train_step_dp(
        model, tx, mesh, max_props=64, pre_nms_topk=128)

    batch = jax.tree.map(
        lambda x: jax.device_put(
            jnp.broadcast_to(x[None], (n,) + x.shape), data_sh), one)
    state = jax.tree.map(lambda x: jax.device_put(x, repl_sh), state)
    state, metrics = step(state, batch)
    jax.block_until_ready(state.params)
    assert np.isfinite(float(metrics["loss"]))


def test_rpn_subsample_labels_matches_reference_semantics():
    """detectron2 sampling.py subsample_labels in static-shape JAX
    (round 5): <=128 random positives, negatives fill to 256, ignores
    never selected. Without the subsample, the RPN objectness sum over
    ~270k anchors at 384x1248 reaches ~4e6 and the first SGD step
    NaNs the params (scripts/bench_vps_train.py finding)."""
    import jax

    from pvo_tpu.vps.losses import subsample_labels

    rng = jax.random.PRNGKey(0)
    labels = jnp.asarray(np.r_[np.ones(10), np.zeros(5000),
                               -np.ones(100)].astype(np.int32))
    sp, sn = subsample_labels(labels, rng)
    assert int(sp.sum()) == 10 and int(sn.sum()) == 246

    labels2 = jnp.asarray(np.r_[np.ones(500),
                                np.zeros(5000)].astype(np.int32))
    sp, sn = subsample_labels(labels2, rng)
    assert int(sp.sum()) == 128 and int(sn.sum()) == 128
    assert not bool((sp & sn).any())

    sp, sn = subsample_labels(jnp.asarray(-np.ones(50, np.int32)), rng)
    assert int(sp.sum()) == 0 and int(sn.sum()) == 0
