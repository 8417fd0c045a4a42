"""Non-keyframe pose interpolation + motion-only BA refinement.

Rebuild of the reference PoseTrajectoryFiller (VO_Module/droid_slam/
trajectory_filler.py): non-keyframes are batched (16 at a time), their
poses linearly interpolated in the SE3 tangent between bracketing
keyframes, then refined with 6 motion-only BA iterations against both
bracketing keyframes.

TPU choreography: each batch is FOUR device programs — batched fnet
encode, one fused stage-frames program (SE3 tangent interpolation +
all buffer rows written in-program), the 6-step motion-only update,
and one pose readback. The round-2 version dispatched per-frame
(16 eager SE3 chains + 16 fnet calls + 16 multi-field writes) and
spent 120 s of relay round-trips at 100 keyframes where the device
work is ~2 s (docs/PERF.md, scripts/profile_terminate.py). Tail
batches are padded to the full batch width so every batch reuses one
compiled program; padded rows are discarded at readback.
"""

from __future__ import annotations

import functools
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from pvo_tpu.lie import se3
from pvo_tpu.vo.factor_graph import FactorGraph
from pvo_tpu.vo.net.droidnet import normalize_images


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3),
                   static_argnames=("N",))
def _stage_frames(poses, disps, fmaps, intrinsics, gmaps, t0, t1,
                  wfac, intr8, N):
    """SE3 tangent interpolation between bracketing keyframes
    (reference trajectory_filler.py:50-58) + batched temp-frame write
    at rows [N, N+M): ONE dispatch for the whole batch."""
    dP = se3.mul(poses[t1], se3.inv(poses[t0]))
    Gs = se3.mul(se3.exp(se3.log(dP) * wfac), poses[t0])
    M = gmaps.shape[0]
    upd = lambda buf, v: jax.lax.dynamic_update_slice_in_dim(
        buf, v.astype(buf.dtype), N, 0)
    poses = upd(poses, Gs)
    disps = upd(disps, jnp.ones((M,) + disps.shape[1:], disps.dtype))
    fmaps = upd(fmaps, gmaps)
    intrinsics = upd(intrinsics, intr8)
    return poses, disps, fmaps, intrinsics


@functools.lru_cache(maxsize=8)
def _feat_fn(fnet_apply):
    """Process-wide jitted batched fnet encode. Keyed on the flax
    bound-method (modules hash by structure, so every VOSystem
    instance hits the same trace) — a per-instance jax.jit here cost
    a full retrace per system, ~10 s of the measured warm terminate
    (scripts/bench_filler.py round 5: filler wall 17.6 s first call
    in a process, 1.7 s warm)."""
    return jax.jit(lambda p, x: fnet_apply(p, normalize_images(x)))


class TrajectoryFiller:
    def __init__(self, video, modules, params, batch=16):
        self.video = video
        self.modules = modules
        self.params = params
        self.batch = batch
        self._graph = None

    def _features_batch(self, filterx, images_u8):
        """Batched fnet encode: one dispatch for the whole batch."""
        return _feat_fn(filterx.fnet_apply)(
            filterx.params["fnet"], jnp.asarray(images_u8))

    def _fill_submit(self, tstamps, images, intrinsics, filterx):
        v = self.video
        N = v.counter
        M = len(tstamps)
        B = min(self.batch, v.buffer - N)
        assert M <= B, (
            f"trajectory filler stages {M} frames past the {N} "
            f"keyframes; video buffer ({v.buffer}) must be at least "
            f"keyframes + batch ({self.batch})")

        # pad the tail batch to full width (constant shapes -> one
        # compiled program family); padded rows repeat the last frame
        # and are dropped at readback
        pad = B - M
        tstamps = list(tstamps) + [tstamps[-1]] * pad
        images = list(images) + [images[-1]] * pad
        intrinsics = list(intrinsics) + [intrinsics[-1]] * pad

        ts = v.tstamp[:N]                     # host array
        tt = np.asarray(tstamps, np.float64)
        t0 = np.array([np.sum(ts <= t) - 1 for t in tt])
        t1 = np.where(t0 < N - 1, t0 + 1, t0)
        dt = ts[t1] - ts[t0] + 1e-3
        wfac = ((tt - ts[t0]) / dt).astype(np.float32)[:, None]

        gmaps = self._features_batch(
            filterx, np.stack([np.asarray(im, np.uint8)
                               for im in images]))
        intr8 = np.stack([np.asarray(i, np.float32) / 8.0
                          for i in intrinsics])
        (v.poses, v.disps, v.fmaps, v.intrinsics) = _stage_frames(
            v.poses, v.disps, v.fmaps, v.intrinsics, gmaps,
            jnp.asarray(t0), jnp.asarray(t1), jnp.asarray(wfac),
            jnp.asarray(intr8), N=N)
        v.tstamp[N:N + B] = tt
        v.counter = N + B

        if self._graph is None:
            self._graph = FactorGraph(
                v, self.modules["update"], self.modules["agg"],
                self.params, max_edges=2 * self.batch + 2,
                max_inactive=1)
        graph = self._graph
        kk = np.arange(N, N + B)
        graph.add_factors(t0, kk)
        graph.add_factors(t1, kk)

        graph.update(N, N + B, motion_only=True, steps=6)
        graph.clear_edges()

        # async pose readback: the slice materializes its own buffer,
        # so the next batch's (donating) stage program can't touch it;
        # the d2h streams while that batch runs
        pose_dev = v.poses[N:N + M]
        if hasattr(pose_dev, "copy_to_host_async"):
            pose_dev.copy_to_host_async()
        v.counter = N
        return (pose_dev, M)

    def _resolve(self, handle):
        pose_dev, M = handle
        return np.asarray(pose_dev)

    def _fill(self, tstamps, images, intrinsics, filterx):
        return self._resolve(
            self._fill_submit(tstamps, images, intrinsics, filterx))

    def __call__(self, image_stream, filterx):
        """image_stream yields (tstamp, image(H,W,3 RGB u8),
        intrinsics, segments). Returns (T, 7) poses for every frame.

        Batches are PIPELINED one deep: batch k's blocking pose read
        happens after batch k+1's programs are dispatched, so host
        prep + the ~9 MB image upload of each batch ride the previous
        batch's device time (terminate at 100 keyframes spends ~2/3 of
        the filler wall on this serialization otherwise)."""
        pose_list = []
        pending = None
        ts, ims, intr = [], [], []
        prof = os.environ.get("PVO_PROFILE_FILLER")

        def flush(ts, ims, intr):
            nonlocal pending
            t0 = time.monotonic()
            handle = self._fill_submit(ts, ims, intr, filterx)
            t1 = time.monotonic()
            if pending is not None:
                pose_list.append(self._resolve(pending))
            if prof:
                print(f"    filler batch: submit {t1 - t0:6.3f}s "
                      f"resolve_prev {time.monotonic() - t1:6.3f}s",
                      flush=True)
            pending = handle

        for item in image_stream:
            tstamp, image, intrinsics = item[0], item[1], item[2]
            ts.append(tstamp)
            ims.append(image)
            intr.append(intrinsics)
            if len(ts) == self.batch:
                flush(ts, ims, intr)
                ts, ims, intr = [], [], []
        if ts:
            flush(ts, ims, intr)
        if pending is not None:
            pose_list.append(self._resolve(pending))
        return np.concatenate(pose_list, axis=0)
