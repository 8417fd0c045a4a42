"""Sliding-window local bundle adjustment frontend.

Rebuild of the reference DroidFrontend (VO_Module/droid_slam/
droid_frontend.py): initialization at ``warmup`` keyframes (neighborhood
factors + 8 updates, proximity factors + 12 updates), then per-keyframe
updates (age-based factor retirement, proximity factor proposal,
4+2 recurrent updates, redundant-keyframe removal).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


class Frontend:
    def __init__(self, graph, video, cfg):
        self.graph = graph
        self.video = video
        self.cfg = cfg

        self.t0 = 0
        self.t1 = 0
        self.is_initialized = False
        self.count = 0

        self.max_age = cfg.max_age
        self.iters1 = cfg.frontend_iters1
        self.iters2 = cfg.frontend_iters2

    def _update(self):
        cfg = self.cfg
        self.count += 1
        self.t1 += 1

        if self.graph.n_edges > 0:
            self.graph.rm_factors(self.graph.age > self.max_age,
                                  store=True)

        self.graph.add_proximity_factors(
            self.t1 - 5, max(self.t1 - cfg.frontend_window, 0),
            rad=cfg.frontend_radius, nms=cfg.frontend_nms,
            thresh=cfg.frontend_thresh, beta=cfg.beta, remove=True)

        # the keyframe-removal distance rides along with the fused
        # update (one round-trip fewer)
        d = self.graph.update(None, None, use_inactive=True,
                              steps=self.iters1,
                              dist_pair=(self.t1 - 3, self.t1 - 2))

        if float(d[0]) < cfg.keyframe_thresh:
            self.graph.rm_keyframe(self.t1 - 2)
            self.video.counter -= 1
            self.t1 -= 1
        else:
            self.graph.update(None, None, use_inactive=True,
                              steps=self.iters2)

        # seed the next frame's pose/depth (reference
        # droid_frontend.py:64-66)
        v = self.video
        v.poses = v.poses.at[self.t1].set(v.poses[self.t1 - 1])
        v.disps = v.disps.at[self.t1].set(
            jnp.mean(v.disps[self.t1 - 1]))

    def _initialize(self):
        self.t0 = 0
        self.t1 = self.video.counter

        self.graph.add_neighborhood_factors(self.t0, self.t1, r=3)
        self.graph.update(1, use_inactive=True, steps=8)

        self.graph.add_proximity_factors(
            0, 0, rad=2, nms=2, thresh=self.cfg.frontend_thresh)
        self.graph.update(1, use_inactive=True, steps=12)

        v = self.video
        v.poses = v.poses.at[self.t1].set(v.poses[self.t1 - 1])
        v.disps = v.disps.at[self.t1].set(
            jnp.mean(v.disps[self.t1 - 4:self.t1]))

        self.is_initialized = True
        self.video.ready = True

    def __call__(self):
        if not self.is_initialized and \
                self.video.counter == self.cfg.warmup:
            self._initialize()
        elif self.is_initialized and self.t1 < self.video.counter:
            self._update()
