"""VPS training CLI (reference VPS_Module/tools/train_net.py:184-194).

Trains Panoptic FPN on vkitti in either of the reference's two modes:

  * full      — every head learns (backbone/FPN/RPN/box/mask/semseg),
                the mode that produces a panFPN.pth-equivalent from
                scratch (train_net.py Trainer over PanopticFPN losses).
  * fusion    — flow-guided fusion finetune: only fusion_conv1 moves
                (panoptic_fpn.py:75-100 freezing + MODEL.PANOPTIC_FPN
                .FUSION=True configs).

The reference's mp.spawn + DDP/NCCL launch collapses into one jitted
train step; pass --devices>1 to shard the batch over a data mesh
(XLA inserts the gradient all-reduce over ICI).
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))


import argparse
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--datapath", default="datasets/Virtual_KITTI2")
    p.add_argument("--dataset", default="vkitti_511_train")
    p.add_argument("--mode", default="full",
                   choices=["full", "fusion"])
    p.add_argument("--config", default=None,
                   help="yacs yaml overriding solver defaults")
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--max_iter", type=int, default=None)
    p.add_argument("--weights", default=None,
                   help="torch .pth or orbax dir to initialize from")
    p.add_argument("--out", default="runs/vps")
    p.add_argument("--ckpt_every", type=int, default=None)
    p.add_argument("--log_every", type=int, default=20)
    p.add_argument("--max_instances", type=int, default=32)
    p.add_argument("--shared_data", default="shared_data")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from pvo_tpu.utils import checkpoint as ckpt
    from pvo_tpu.utils.logger import Logger
    from pvo_tpu.vps import datasets as D
    from pvo_tpu.vps import train as T
    from pvo_tpu.vps.config import get_cfg
    from pvo_tpu.vps.panoptic_fpn import PanopticFPN

    cfg = get_cfg()
    if args.config:
        cfg.merge_from_file(args.config)
    lr = args.lr if args.lr is not None else cfg.SOLVER.BASE_LR
    max_iter = (args.max_iter if args.max_iter is not None
                else cfg.SOLVER.MAX_ITER)
    ckpt_every = (args.ckpt_every if args.ckpt_every is not None
                  else cfg.SOLVER.CHECKPOINT_PERIOD)

    D.register_vkitti(args.datapath, args.shared_data)
    records = D.get(args.dataset)
    if args.mode == "fusion":
        records = [r for r in records if r.get("ref_file_name")]
    if not records:
        raise SystemExit(f"no records in {args.dataset}")
    print(f"{len(records)} training records from {args.dataset}")

    model = PanopticFPN()
    sample = D.train_sample_mapper(records[0],
                                   max_instances=args.max_instances)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(sample["image"]))
    if args.weights:
        if args.weights.endswith((".pth", ".pkl")):
            from pvo_tpu.utils.convert_vps import load_panoptic_fpn_torch
            params = load_panoptic_fpn_torch(args.weights)
        else:
            params = ckpt.load(args.weights, template=params)

    if args.mode == "fusion":
        tx = T.make_fusion_optimizer(params, lr=lr)
        step = T.make_fusion_train_step(model, tx)
    else:
        tx = T.make_solver(base_lr=lr, max_iter=max_iter,
                           params=params)
        step = T.make_full_train_step(model, tx)
    state = T.TrainState(params, tx.init(params),
                         jnp.zeros((), jnp.int32))

    logger = Logger("train_vps", log_every=args.log_every,
                    logdir=args.out)
    rng = np.random.RandomState(0)
    t0 = time.time()
    for it in range(max_iter):
        rec = records[rng.randint(len(records))]
        batch = D.train_sample_mapper(
            rec, max_instances=args.max_instances)
        if args.mode == "fusion":
            if "flow" not in batch:
                H, W = batch["image"].shape[1:3]
                batch["flow"] = np.zeros((H, W, 2), np.float32)
            batch = {
                "cur_image": batch["image"],
                "ref_image": batch.get("ref_image", batch["image"]),
                "flow": batch["flow"],
                "gt_boxes": batch["gt_boxes"],
                "gt_classes": batch["gt_classes"],
                "gt_valid": batch["gt_valid"],
                "sem_labels": batch["sem_labels"],
                "gt_masks": batch["gt_masks"],
            }
        state, metrics = step(state, batch)
        logger.push({k: float(v) for k, v in metrics.items()})
        if (it + 1) % args.log_every == 0:
            dt = (time.time() - t0) / args.log_every
            print(f"iter {it + 1}/{max_iter}  "
                  f"loss {float(metrics['loss']):.4f}  {dt:.2f}s/it")
            t0 = time.time()
        if (it + 1) % ckpt_every == 0 or it + 1 == max_iter:
            ckpt.save(args.out, it + 1, state.params)
            print(f"checkpoint @ {it + 1} -> {args.out}")


if __name__ == "__main__":
    main()
