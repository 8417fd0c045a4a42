"""Data-parallel VO training over a jax.sharding.Mesh.

Replaces the reference's DDP/NCCL machinery (VO_Module/train.py:28-41,
mp.spawn + DistributedDataParallel + DistributedSampler) with the
TPU-native recipe: ONE jitted train step whose batch is sharded over the
``data`` mesh axis and whose params/optimizer state are replicated; XLA
inserts the gradient all-reduce over ICI automatically. No process
groups, no samplers — shard the input, jit, done.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pvo_tpu.geom import projective
from pvo_tpu.vo import losses
from pvo_tpu.vo.net.droidnet import DroidNet


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_mesh(devices=None, axis="data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def make_optimizer(lr=5e-4, total_steps=20000, clip=2.5,
                   weight_decay=1e-5):
    """Adam + OneCycle + grad clipping (reference train.py:95-98,:292)."""
    sched = optax.cosine_onecycle_schedule(
        transition_steps=total_steps, peak_value=lr, pct_start=0.01)
    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(sched),
    )


def vo_loss_fn(model: DroidNet, params, batch, ii, jj, num_steps,
               weights: Dict[str, float], mode="sup", ph_loss=True,
               ret_est=False, remat=False):
    """Per-sample loss with the reference's mode dispatch
    (train.py:178-261): sup = geodesic + cam-flow + gt-label (+photo);
    semisup = cam-photometric + gt-label (+photo); unsup =
    cam-photometric w/ occlusion vals + self-labeled masks (+photo).
    Residual loss always applies."""
    out = model.apply(
        params, batch["poses_init"], batch["images"],
        batch["disps_init"], batch["intrinsics"], ii, jj,
        num_steps=num_steps, ret_flow=ph_loss, downsample=True,
        remat=remat)

    w = lambda k, d: weights.get(k, d)
    res, _ = losses.residual_loss(out["residuals"])
    total = w("w2", 0.01) * res
    metrics = {"res": res}

    if mode == "sup":
        geo, geo_m = losses.geodesic_loss(
            batch["poses_gt"], out["poses"], ii, jj, do_scale=False)
        camf, camf_m = losses.cam_flow_loss(
            batch["poses_gt"], batch["disps_gt_up"], out["poses"],
            out["disps_up"], batch["intrinsics_up"])
        gtl, _ = losses.gt_label_loss(
            batch["gt_masks"], batch["gt_vals"], out["masks_up"], ii)
        total += (w("w1", 40.0) * geo + w("w3", 0.20) * camf +
                  w("w9", 0.01) * gtl)
        metrics.update({"geo": geo, "cam_flow": camf, "gt_l": gtl,
                        **geo_m, **camf_m})

    elif mode == "semisup":
        cam_ph, cpm = losses.photo_loss_cam(
            batch["images"].astype(jnp.float32), out["poses"],
            out["disps_up"], batch["intrinsics_up"],
            batch["gt_masks"])
        gtl, _ = losses.gt_label_loss(
            batch["gt_masks"], batch["gt_vals"], out["masks_up"], ii)
        total += w("w10", 100.0) * cam_ph + w("w9", 0.01) * gtl
        metrics.update({"cam_ph": cam_ph, "gt_l": gtl, **cpm})

    elif mode == "unsup":
        # occlusion validity masks gate the cam-photometric term
        rii, rjj = _ring(batch["images"].shape[1])
        occ = losses.unsup_occ_vals(
            out["poses"], out["disps_up"], batch["intrinsics_up"],
            rii, rjj)
        # unsup_occ_vals yields per-edge masks; photo_loss_cam expects
        # per-frame masks — scatter-min onto the source frames
        F = batch["images"].shape[1]
        per_frame = jnp.ones(
            (occ.shape[0], F) + occ.shape[2:], occ.dtype)
        per_frame = per_frame.at[:, rii].min(occ)
        cam_ph, cpm = losses.photo_loss_cam(
            batch["images"].astype(jnp.float32), out["poses"],
            out["disps_up"], batch["intrinsics_up"], per_frame)

        # self-labeled static masks: full flow ~ camera flow at 1/8
        disps8 = out["disps_up"][-1][:, :, 3::8, 3::8]
        cam_flow, _ = projective.induced_flow(
            out["poses"][-1], disps8, batch["intrinsics"], ii, jj)
        art = losses.self_label_masks(out["flows"][-1], cam_flow)
        masks8 = [m[:, :, 3::8, 3::8] for m in out["masks_up"]]
        al, _ = losses.art_label_loss(art, masks8)
        total += w("w10", 100.0) * cam_ph + w("w6", 0.05) * al
        metrics.update({"cam_ph": cam_ph, "al": al, **cpm})

    if ph_loss:
        vals = batch.get("gt_vals")
        ph, phm = losses.photo_loss_full(
            batch["images"].astype(jnp.float32), out["flows"], vals,
            ii, jj, use_ssim=False, downsample=True)
        total += w("w4", 5.0) * ph
        metrics.update({"ph": ph, **phm})

    if ret_est:
        # last pose/disp estimates for the reference's random-restart
        # carry (train.py:264-265: Gs = poses_est[-1].detach(),
        # disp0 = disps_est[-1][:, :, 3::8, 3::8].detach())
        est = (jax.lax.stop_gradient(out["poses"][-1]),
               jax.lax.stop_gradient(
                   out["disps_up"][-1][:, :, 3::8, 3::8]))
        return total, (metrics, est)
    return total, metrics


def _ring(F):
    ii, jj = [], []
    for i in range(F):
        for j in (i - 1, i + 1):
            if 0 <= j < F:
                ii.append(i)
                jj.append(j)
    return np.asarray(ii), np.asarray(jj)


def make_train_step(model: DroidNet, tx, ii, jj, num_steps=8,
                    weights=None, mode="sup", ph_loss=True):
    """Build the jitted data-parallel train step.

    The returned step expects batch pytrees whose leaves have a leading
    device-batch axis sharded over the mesh's ``data`` axis.
    """
    weights = weights or {}
    ii = np.asarray(ii)
    jj = np.asarray(jj)

    def single(params, sample):
        return vo_loss_fn(model, params, sample, ii, jj, num_steps,
                          weights, mode=mode, ph_loss=ph_loss)

    def step(state: TrainState, batch):
        def batch_loss(params):
            loss, metrics = jax.vmap(
                functools.partial(single, params))(batch)
            return jnp.mean(loss), jax.tree.map(jnp.mean, metrics)

        (loss, metrics), grads = jax.value_and_grad(
            batch_loss, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), \
            {"loss": loss, **metrics}

    return step


def make_restart_step(model: DroidNet, tx, ii, jj, num_steps=8,
                      weights=None, mode="sup", ph_loss=True,
                      remat=False):
    """Faithful reference restart semantics (train.py:150-265): each
    restart pass re-runs the model from the LAST pose/disp estimates
    and its loss gradient ACCUMULATES; clip + optimizer step apply
    once per outer step (reference: loss.backward() inside the while,
    optimizer.step() after it).

    Returns (pass_fn, apply_fn, acc_fn):
      pass_fn(params, batch, poses_init, disps_init) ->
        (loss, metrics, grads, (poses_last, disps8_last))
      acc_fn(acc_grads, grads) -> summed grads pytree
      apply_fn(state, grads) -> new TrainState
    """
    weights = weights or {}
    ii = np.asarray(ii)
    jj = np.asarray(jj)

    def single(params, sample, pi, di):
        s = {**sample, "poses_init": pi, "disps_init": di}
        return vo_loss_fn(model, params, s, ii, jj, num_steps,
                          weights, mode=mode, ph_loss=ph_loss,
                          ret_est=True, remat=remat)

    def pass_fn(params, batch, poses_init, disps_init):
        def batch_loss(p):
            loss, (metrics, est) = jax.vmap(
                functools.partial(single, p))(batch, poses_init,
                                              disps_init)
            return jnp.mean(loss), (jax.tree.map(jnp.mean, metrics),
                                    est)

        (loss, (metrics, est)), grads = jax.value_and_grad(
            batch_loss, has_aux=True)(params)
        return loss, metrics, grads, est

    def acc_fn(acc, grads):
        return jax.tree.map(jnp.add, acc, grads)

    def apply_fn(state: TrainState, grads):
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1)

    return pass_fn, apply_fn, acc_fn


def shard_batch(batch, mesh: Mesh, axis="data"):
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def make_synthetic_batch(n_dev, F=4, H=48, W=64, seed=0):
    """Tiny random batch for dry-runs and tests."""
    rng = np.random.RandomState(seed)
    h, w = H // 8, W // 8
    from pvo_tpu.lie import se3
    tang = 0.05 * rng.randn(n_dev, 1, F, 6).astype(np.float32)
    poses_gt = np.asarray(se3.exp(jnp.asarray(tang)))
    ident = np.zeros((n_dev, 1, F, 7), np.float32)
    ident[..., 6] = 1.0
    return {
        "images": rng.randint(0, 255, (n_dev, 1, F, H, W, 3)
                              ).astype(np.uint8),
        "poses_gt": poses_gt,
        "poses_init": ident,
        "disps_init": np.ones((n_dev, 1, F, h, w), np.float32),
        "disps_gt_up": 1.0 + 0.1 * rng.rand(
            n_dev, 1, F, H, W).astype(np.float32),
        "intrinsics": np.tile(np.array(
            [W / 8.0, W / 8.0, w / 2.0, h / 2.0], np.float32),
            (n_dev, 1, F, 1)),
        "intrinsics_up": np.tile(np.array(
            [W, W, W / 2.0, H / 2.0], np.float32), (n_dev, 1, F, 1)),
        "gt_masks": np.ones((n_dev, 1, F, H, W), np.float32),
        "gt_vals": np.ones((n_dev, 1, F, H, W), np.float32),
    }


def dryrun(n_devices=None, num_steps=2, dry=False):
    """Jit + execute one sharded train step on tiny shapes.

    dry=True trims the loss graph (no photometric term) so a COLD
    compile on a CPU-simulated mesh stays fast; the sharded train-step
    structure (data-sharded batch, replicated params, XLA grad
    all-reduce) is identical to the real one.
    """
    devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    mesh = make_mesh(devices)
    n_dev = len(devices)

    model = DroidNet()
    F = 4
    ii, jj = [], []
    for a in range(F):
        for b in range(F):
            if a != b and abs(a - b) <= 2:
                ii.append(a)
                jj.append(b)

    batch = make_synthetic_batch(n_dev)
    sample = jax.tree.map(lambda x: jnp.asarray(x[0]), batch)
    params = model.init(
        jax.random.PRNGKey(0), sample["poses_init"], sample["images"],
        sample["disps_init"], sample["intrinsics"], np.asarray(ii),
        np.asarray(jj), num_steps=1)

    tx = make_optimizer(total_steps=100)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    step = make_train_step(model, tx, ii, jj, num_steps=num_steps,
                           ph_loss=not dry)

    with mesh:
        state = replicate(state, mesh)
        batch = shard_batch(batch, mesh)
        jstep = jax.jit(step, donate_argnums=(0,))
        state, metrics = jstep(state, batch)
        jax.block_until_ready(state.params)
    return jax.tree.map(float, metrics)
