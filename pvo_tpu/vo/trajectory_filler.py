"""Non-keyframe pose interpolation + motion-only BA refinement.

Rebuild of the reference PoseTrajectoryFiller (VO_Module/droid_slam/
trajectory_filler.py): non-keyframes are batched (16 at a time), their
poses linearly interpolated in the SE3 tangent between bracketing
keyframes, then refined with 6 motion-only BA iterations against both
bracketing keyframes.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from pvo_tpu.lie import se3
from pvo_tpu.vo.factor_graph import FactorGraph


class TrajectoryFiller:
    def __init__(self, video, modules, params, batch=16):
        self.video = video
        self.modules = modules
        self.params = params
        self.batch = batch

    def _fill(self, tstamps, images, intrinsics, filterx):
        v = self.video
        N = v.counter
        M = len(tstamps)
        assert N + M <= v.buffer, (
            f"trajectory filler stages {M} frames past the {N} "
            f"keyframes; video buffer ({v.buffer}) must be at least "
            f"keyframes + batch ({self.batch})")

        ts = v.tstamp[:N]
        poses = v.poses[:N]

        tt = np.asarray(tstamps, np.float64)
        t0 = np.array([np.sum(ts <= t) - 1 for t in tt])
        t1 = np.where(t0 < N - 1, t0 + 1, t0)

        dt = jnp.asarray(ts[t1] - ts[t0] + 1e-3, jnp.float32)[:, None]
        dP = se3.mul(poses[jnp.asarray(t1)],
                     se3.inv(poses[jnp.asarray(t0)]))
        vel = se3.log(dP) / dt
        w = vel * jnp.asarray(tt - ts[t0], jnp.float32)[:, None]
        Gs = se3.mul(se3.exp(w), poses[jnp.asarray(t0)])

        # write temporary frames [N, N+M)
        for k in range(M):
            gmap = filterx._features(jnp.asarray(images[k], jnp.uint8))
            v.set_frame(N + k, tstamps[k], image=images[k],
                        pose=np.asarray(Gs[k]),
                        disp=np.ones((v.h, v.w), np.float32),
                        intrinsics=np.asarray(intrinsics[k]) / 8.0,
                        fmap=gmap)

        graph = FactorGraph(
            v, self.modules["update"], self.modules["agg"],
            self.params, max_edges=2 * self.batch + 2, max_inactive=1)
        kk = np.arange(N, N + M)
        graph.add_factors(t0, kk)
        graph.add_factors(t1, kk)

        graph.update(N, N + M, motion_only=True, steps=6)

        out = np.asarray(v.poses[N:N + M])
        v.counter = N
        return out

    def __call__(self, image_stream, filterx):
        """image_stream yields (tstamp, image(H,W,3 RGB u8),
        intrinsics, segments). Returns (T, 7) poses for every frame."""
        pose_list = []
        ts, ims, intr = [], [], []
        for item in image_stream:
            tstamp, image, intrinsics = item[0], item[1], item[2]
            ts.append(tstamp)
            ims.append(image)
            intr.append(intrinsics)
            if len(ts) == self.batch:
                pose_list.append(self._fill(ts, ims, intr, filterx))
                ts, ims, intr = [], [], []
        if ts:
            pose_list.append(self._fill(ts, ims, intr, filterx))
        return np.concatenate(pose_list, axis=0)
