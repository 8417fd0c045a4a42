"""Training-learns evidence for the VO trainer (VERDICT round-3 #6).

Runs the REAL data-parallel train step (parallel/data_parallel.py —
the same code scripts/train_vo.py drives) for N steps on a fixed
synthetic supervised batch on the actual accelerator, and records:

  * the loss curve (must decrease materially — the overfit-one-batch
    canary: if the full differentiable stack [feature nets -> ConvGRU
    -> heads -> 2x BA Schur solve -> losses] has a broken gradient
    anywhere, this does NOT converge),
  * steps/sec on the chip,
  * an orbax checkpoint save -> restore round-trip through the
    CheckpointManager used by the CLI.

Writes BENCH_TRAIN_VO.json and prints one BENCH-style JSON line.
Reference analog: VO_Module/train.py:150-311 (the production loop this
evidences).
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
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--mode", default="sup")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pvo_tpu.parallel import data_parallel as dp
    from pvo_tpu.vo.net.droidnet import DroidNet

    mesh = dp.make_mesh()
    n_dev = len(jax.devices())
    model = DroidNet()
    F = 4
    ii, jj = dp._ring(F)

    batch = dp.make_synthetic_batch(n_dev, F=F, H=48, W=64, seed=0)
    sample = jax.tree.map(lambda x: jnp.asarray(x[0]), batch)
    params = model.init(
        jax.random.PRNGKey(0), sample["poses_init"], sample["images"],
        sample["disps_init"], sample["intrinsics"], ii, jj,
        num_steps=1)

    tx = dp.make_optimizer(args.lr, total_steps=args.steps)
    state = dp.TrainState(params, tx.init(params),
                          jnp.zeros((), jnp.int32))
    step_fn = jax.jit(dp.make_train_step(
        model, tx, ii, jj, num_steps=args.iters, mode=args.mode),
        donate_argnums=(0,))

    curve = []
    with mesh:
        state = dp.replicate(state, mesh)
        batch = dp.shard_batch(batch, mesh)

        t0 = time.perf_counter()
        state, metrics = step_fn(state, batch)
        loss0 = float(metrics["loss"])
        compile_s = time.perf_counter() - t0
        curve.append(loss0)

        t0 = time.perf_counter()
        for k in range(1, args.steps):
            state, metrics = step_fn(state, batch)
            if k % 10 == 0 or k == args.steps - 1:
                curve.append(float(metrics["loss"]))
        jax.block_until_ready(state.params)
        steps_per_sec = (args.steps - 1) / (time.perf_counter() - t0)

    final = curve[-1]
    ratio = final / max(loss0, 1e-12)

    # checkpoint round-trip through the CLI's manager
    import shutil
    import orbax.checkpoint as ocp
    ckpt_dir = os.path.abspath("checkpoints/_bench_train_vo")
    shutil.rmtree(ckpt_dir, ignore_errors=True)
    mngr = ocp.CheckpointManager(ckpt_dir)
    host_params = jax.device_get(state.params)
    mngr.save(args.steps, args=ocp.args.StandardSave(host_params))
    mngr.wait_until_finished()
    restored = mngr.restore(args.steps,
                            args=ocp.args.StandardRestore(host_params))
    flat0 = jax.tree.leaves(host_params)
    flat1 = jax.tree.leaves(restored)
    ckpt_ok = all(np.allclose(a, b) for a, b in zip(flat0, flat1))
    shutil.rmtree(ckpt_dir, ignore_errors=True)

    out = {
        "metric": "vo_train_loss_ratio",
        "value": round(ratio, 4),
        "unit": (f"final/initial loss after {args.steps} steps "
                 f"(sup, {args.iters} iters, 48x64xF4; "
                 f"{steps_per_sec:.2f} steps/s, compile {compile_s:.0f}"
                 f" s, ckpt_roundtrip={'ok' if ckpt_ok else 'FAIL'})"),
        "vs_baseline": None,
        "loss_initial": round(loss0, 4),
        "loss_final": round(final, 4),
        "steps_per_sec": round(steps_per_sec, 3),
        "ckpt_roundtrip_ok": bool(ckpt_ok),
        "loss_curve": [round(x, 4) for x in curve],
    }
    print(json.dumps(out))
    with open("BENCH_TRAIN_VO.json", "w") as f:
        json.dump(out, f, indent=1)
    assert ckpt_ok
    assert final < 0.5 * loss0, (
        f"loss did not decrease materially: {loss0} -> {final}")


if __name__ == "__main__":
    main()
