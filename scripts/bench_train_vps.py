"""Training-learns evidence for the VPS fusion finetune (VERDICT #6).

Runs the REAL fusion-finetune step (vps/train.py make_fusion_train_step
— only fusion_conv1 moves, everything else frozen, exactly the
reference's fusion mode panoptic_fpn.py:75-100) for N steps on a fixed
synthetic (ref, cur) pair on the actual accelerator, recording the loss
curve (must decrease) and steps/sec.

Writes BENCH_TRAIN_VPS.json and prints one BENCH-style JSON line.
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse
import json
import os
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=150)
    p.add_argument("--lr", type=float, default=2.5e-3)
    p.add_argument("--height", type=int, default=64)
    p.add_argument("--width", type=int, default=96)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pvo_tpu.vps.panoptic_fpn import PanopticFPN
    from pvo_tpu.vps.train import (TrainState, make_fusion_optimizer,
                                   make_fusion_train_step)

    H, W = args.height, args.width
    key = jax.random.PRNGKey(0)
    model = PanopticFPN(backbone_blocks=(1, 1, 1, 1))

    masks = np.zeros((4, H, W), np.float32)
    masks[0, 4:20, 4:20] = 1.0
    masks[1, 6:24, 10:30] = 1.0
    batch = {
        "cur_image": jax.random.normal(key, (1, H, W, 3)) * 20 + 90,
        "ref_image": jax.random.normal(
            jax.random.PRNGKey(1), (1, H, W, 3)) * 20 + 90,
        "flow": jnp.zeros((H, W, 2), jnp.float32),
        "gt_boxes": jnp.asarray(
            [[4., 4., 20., 20.], [10., 6., 30., 24.],
             [0., 0., 1., 1.], [0., 0., 1., 1.]]),
        "gt_classes": jnp.asarray([1, 2, 0, 0]),
        "gt_valid": jnp.asarray([True, True, False, False]),
        "sem_labels": jnp.ones((1, H, W), jnp.int32) * 3,
        "gt_masks": jnp.asarray(masks),
    }

    params = model.init(key, batch["cur_image"])
    tx = make_fusion_optimizer(params, lr=args.lr)
    state = TrainState(params, tx.init(params),
                       jnp.zeros((), jnp.int32))
    step = make_fusion_train_step(model, tx, max_props=32,
                                  pre_nms_topk=64)

    t0 = time.perf_counter()
    state, metrics = step(state, batch)
    loss0 = float(metrics["loss"])
    compile_s = time.perf_counter() - t0
    curve = [loss0]

    t0 = time.perf_counter()
    for k in range(1, args.steps):
        state, metrics = step(state, batch)
        if k % 10 == 0 or k == args.steps - 1:
            curve.append(float(metrics["loss"]))
    jax.block_until_ready(state.params)
    steps_per_sec = (args.steps - 1) / (time.perf_counter() - t0)

    final = curve[-1]
    ratio = final / max(loss0, 1e-12)
    out = {
        "metric": "vps_fusion_train_loss_ratio",
        "value": round(ratio, 4),
        "unit": (f"final/initial loss after {args.steps} fusion-only "
                 f"steps @{H}x{W} ({steps_per_sec:.2f} steps/s, "
                 f"compile {compile_s:.0f} s)"),
        "vs_baseline": None,
        "loss_initial": round(loss0, 4),
        "loss_final": round(final, 4),
        "steps_per_sec": round(steps_per_sec, 3),
        "loss_curve": [round(x, 4) for x in curve],
    }
    print(json.dumps(out))
    with open("BENCH_TRAIN_VPS.json", "w") as f:
        json.dump(out, f, indent=1)
    assert final < 0.9 * loss0, (
        f"fusion finetune did not reduce the loss: {loss0} -> {final}")


if __name__ == "__main__":
    main()
