"""DepthVideo: the shared SLAM state buffer, device-resident.

Rebuild of the reference DepthVideo (VO_Module/droid_slam/depth_video.py):
a fixed-size ring of keyframe state — timestamps, images, w2c poses,
inverse depths (1/8 res), intrinsics, correlation/context features, local
panoptic-segment ids, and full flow.

TPU design deltas:
  * all state lives in jax device arrays updated functionally
    (``.at[].set``) from a single host thread — the reference's
    share-memory tensors + multiprocessing lock disappear because the
    TPU system is single-process (SURVEY.md §2.4);
  * segment maps are stored as LOCAL ids in [0, max_segments) remapped on
    the host at append time, which makes the dynamic-segment filter a
    static-shape on-device segment-sum instead of the reference's
    numpy/unique host round-trip (factor_graph.py:256-276);
  * features are bf16 (HBM-bandwidth bound ops), geometry is fp32.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from pvo_tpu.geom import projective
from pvo_tpu.geom.distance import frame_distance_bidirectional
from pvo_tpu.lie import se3


class DepthVideo:
    def __init__(self, image_size=(240, 808), buffer=512,
                 segm_filter=False, thresh=0.8, max_segments=96,
                 feat_dtype=jnp.bfloat16):
        self.ht, self.wd = image_size
        self.h, self.w = self.ht // 8, self.wd // 8
        self.buffer = buffer
        self.segm_filter = segm_filter
        self.thresh = thresh
        self.max_segments = max_segments

        self.counter = 0
        self.ready = False

        B, h, w = buffer, self.h, self.w
        self.tstamp = np.zeros(B, np.float64)  # host (used for interp)
        self.images = jnp.zeros((B, self.ht, self.wd, 3), jnp.uint8)
        self.poses = jnp.broadcast_to(
            se3.identity(dtype=jnp.float32), (B, 7)).copy()
        self.disps = jnp.ones((B, h, w), jnp.float32)
        self.disps_up = jnp.zeros((B, self.ht, self.wd), jnp.float32)
        self.intrinsics = jnp.zeros((B, 4), jnp.float32)

        self.fmaps = jnp.zeros((B, h, w, 128), feat_dtype)
        self.nets = jnp.zeros((B, h, w, 128), feat_dtype)
        self.inps = jnp.zeros((B, h, w, 128), feat_dtype)

        self.segms = jnp.zeros((B, h, w), jnp.int32)
        self.full_flow = jnp.ones((B, h, w, 2), jnp.float32)
        self.damping = 1e-6 * jnp.ones((B, h, w), jnp.float32)

    # ---------- append / set ----------

    def _remap_segments(self, segm):
        """Host remap of arbitrary panoptic ids -> local [0, S) ids;
        id 0 stays 0 ('no segment', never filtered)."""
        s = np.asarray(segm).reshape(self.h, self.w)
        uniq = np.unique(s)
        uniq = uniq[uniq != 0]
        table = {0: 0}
        for k, u in enumerate(uniq[: self.max_segments - 1]):
            table[int(u)] = k + 1
        out = np.zeros_like(s, dtype=np.int32)
        for u, l in table.items():
            out[s == u] = l
        return out

    def append(self, tstamp, image, pose=None, disp=None,
               intrinsics=None, fmap=None, net=None, inp=None,
               segm=None):
        self.set_frame(self.counter, tstamp, image, pose, disp,
                       intrinsics, fmap, net, inp, segm)

    def set_frame(self, ix, tstamp, image=None, pose=None, disp=None,
                  intrinsics=None, fmap=None, net=None, inp=None,
                  segm=None):
        if ix >= self.counter:
            self.counter = ix + 1
        self.tstamp[ix] = float(tstamp)
        if image is not None:
            self.images = self.images.at[ix].set(
                jnp.asarray(image, jnp.uint8))
        if pose is not None:
            self.poses = self.poses.at[ix].set(
                jnp.asarray(pose, jnp.float32))
        if disp is not None:
            self.disps = self.disps.at[ix].set(
                jnp.asarray(disp, jnp.float32))
        if intrinsics is not None:
            self.intrinsics = self.intrinsics.at[ix].set(
                jnp.asarray(intrinsics, jnp.float32))
        if fmap is not None:
            self.fmaps = self.fmaps.at[ix].set(
                jnp.asarray(fmap, self.fmaps.dtype))
        if net is not None:
            self.nets = self.nets.at[ix].set(
                jnp.asarray(net, self.nets.dtype))
        if inp is not None:
            self.inps = self.inps.at[ix].set(
                jnp.asarray(inp, self.inps.dtype))
        if segm is not None and self.segm_filter:
            self.segms = self.segms.at[ix].set(
                jnp.asarray(self._remap_segments(segm)))

    def remove_frame(self, ix):
        """Shift frame ix+1 down onto ix (keyframe removal;
        reference factor_graph.py:202-225)."""
        for name in ("poses", "disps", "intrinsics", "nets", "inps",
                     "fmaps", "segms", "images"):
            arr = getattr(self, name)
            setattr(self, name, arr.at[ix].set(arr[ix + 1]))
        self.tstamp[ix] = self.tstamp[ix + 1]

    # ---------- geometry ----------

    def normalize(self):
        """Mean-disparity normalization (reference depth_video.py:145-152)."""
        t = self.counter
        s = jnp.mean(self.disps[:t])
        self.disps = self.disps.at[:t].divide(s)
        self.poses = self.poses.at[:t, :3].multiply(s)

    def reproject(self, ii, jj):
        ii = np.asarray(ii, np.int64)
        jj = np.asarray(jj, np.int64)
        coords, valid = projective.projective_transform(
            self.poses[None], self.disps[None], self.intrinsics[None],
            ii, jj)
        return coords, valid

    def distance(self, ii, jj, beta=0.3):
        ii = jnp.asarray(np.asarray(ii).reshape(-1))
        jj = jnp.asarray(np.asarray(jj).reshape(-1))
        d = frame_distance_bidirectional(
            self.poses, self.disps, self.intrinsics[0], ii, jj, beta)
        return np.asarray(d)

    def distance_matrix(self, beta=0.3):
        t = self.counter
        ii, jj = np.meshgrid(np.arange(t), np.arange(t), indexing="ij")
        d = self.distance(ii.reshape(-1), jj.reshape(-1), beta)
        return d.reshape(t, t)

    def pose_at(self, ix):
        return np.asarray(self.poses[ix])
