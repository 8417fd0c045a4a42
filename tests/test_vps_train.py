"""Fusion finetune: one train step runs and ONLY fusion_conv1 moves."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvo_tpu.vps.panoptic_fpn import PanopticFPN
from pvo_tpu.vps.train import (TrainState, fusion_param_mask,
                               make_fusion_optimizer,
                               make_fusion_train_step)

H, W = 64, 96


@pytest.mark.slow
def test_fusion_step_only_moves_fusion_conv():
    key = jax.random.PRNGKey(0)
    model = PanopticFPN()
    x = jax.random.normal(key, (1, H, W, 3)) * 20 + 90
    params = model.init(key, x)

    mask = fusion_param_mask(params)
    n_fusion = sum(np.asarray(m).sum() if not isinstance(m, bool)
                   else int(m)
                   for m in jax.tree.leaves(mask))
    assert n_fusion >= 2  # kernel + bias

    tx = make_fusion_optimizer(params, lr=1e-2)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = make_fusion_train_step(model, tx)

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
    }
    params_before = jax.device_get(params)  # step donates its state
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
