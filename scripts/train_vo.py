"""VO training CLI (reference VO_Module/train.py).

Data-parallel training of DroidNet over a jax mesh: the reference's
mp.spawn + DDP + NCCL collapses into one jitted sharded train step.
Supports the sup/semisup loss modes built from pvo_tpu.vo.losses, the
mixed covis/ring edge sampling, random-restart inner loops, OneCycle
Adam with gradient clipping, periodic orbax checkpointing, and the
running-mean console/TensorBoard logger.
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))



import argparse
import os

import numpy as np


def ring_edges(n, r=2):
    ii, jj = [], []
    for a in range(n):
        for b in range(n):
            if a != b and abs(a - b) <= r:
                ii.append(a)
                jj.append(b)
    return np.asarray(ii), np.asarray(jj)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--name", default="vkitti2_dy_train")
    p.add_argument("--datapath", default="datasets/Virtual_KITTI2")
    p.add_argument("--mode", default="semisup",
                   choices=["sup", "semisup", "unsup"])
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--steps", type=int, default=20000)
    p.add_argument("--iters", type=int, default=15)
    p.add_argument("--n_frames", type=int, default=6)
    p.add_argument("--clip", type=float, default=2.5)
    p.add_argument("--batch", type=int, default=1,
                   help="per-device batch")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--ckpt_every", type=int, default=2000)
    p.add_argument("--log_every", type=int, default=100)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from pvo_tpu.data.vkitti2 import VKitti2Dataset
    from pvo_tpu.parallel import data_parallel as dp
    from pvo_tpu.utils.logger import Logger
    from pvo_tpu.vo.net.droidnet import DroidNet

    devices = jax.devices()
    n_dev = len(devices)
    mesh = dp.make_mesh(devices)
    print(f"devices: {n_dev}, mesh: {mesh}")

    db = VKitti2Dataset(args.datapath, "train",
                        n_frames=args.n_frames, mode=args.mode)

    model = DroidNet()
    # fixed ring topology: the covis graph drives CLIP sampling (in the
    # dataset); keeping the edge list static means ONE compiled step.
    ii, jj = ring_edges(args.n_frames)
    tx = dp.make_optimizer(args.lr, args.steps, args.clip)
    # faithful restart semantics (reference train.py:150-265): grad
    # passes accumulate, poses/disps carry between passes, one
    # optimizer step per outer step
    pass_fn, apply_fn, acc_fn = dp.make_restart_step(
        model, tx, ii, jj, num_steps=args.iters, mode=args.mode,
        remat=args.iters > 8)
    pass_fn = jax.jit(pass_fn)
    apply_fn = jax.jit(apply_fn, donate_argnums=(0,))
    acc_fn = jax.jit(acc_fn, donate_argnums=(0,))

    sample = db.sample_clip()
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(sample["poses_init"]),
        jnp.asarray(sample["images"]), jnp.asarray(sample["disps_init"]),
        jnp.asarray(sample["intrinsics"]), ii, jj, num_steps=1)

    import orbax.checkpoint as ocp
    ckpt_dir = os.path.abspath(f"checkpoints/{args.name}")
    mngr = ocp.CheckpointManager(ckpt_dir)
    if args.ckpt:
        params = mngr.restore(int(args.ckpt), args=ocp.args.StandardRestore(params))

    state = dp.TrainState(params, tx.init(params),
                          jnp.zeros((), jnp.int32))
    state = dp.replicate(state, mesh)

    logger = Logger(args.name, log_every=args.log_every)
    rng = np.random.default_rng(12345)
    restart_prob = 0.2  # reference train.py random-restart inner loop
    with mesh:
        for step in range(args.steps):
            clips = [db.sample_clip() for _ in range(n_dev)]
            batch = {k: np.stack([c[k][0] for c in clips])[:, None]
                     for k in sample if k != "segments"}
            batch = dp.shard_batch(batch, mesh)
            # reference restart loop (train.py:150-265): always >= 1
            # pass; each pass restarts from the last estimates and
            # its gradient ACCUMULATES; one optimizer step at the end
            pi, di = batch["poses_init"], batch["disps_init"]
            loss, metrics, grads, (pi, di) = pass_fn(
                state.params, batch, pi, di)
            r = rng.random()
            while r < restart_prob:
                r = rng.random()
                loss, metrics, g2, (pi, di) = pass_fn(
                    state.params, batch, pi, di)
                grads = acc_fn(grads, g2)
            state = apply_fn(state, grads)
            logger.push({k: float(v) for k, v in metrics.items()})

            if (step + 1) % args.ckpt_every == 0:
                mngr.save(step + 1, args=ocp.args.StandardSave(
                    jax.device_get(state.params)))
    mngr.save(args.steps, args=ocp.args.StandardSave(
        jax.device_get(state.params)))
    mngr.wait_until_finished()


if __name__ == "__main__":
    main()
