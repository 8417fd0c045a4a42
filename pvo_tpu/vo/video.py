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

import functools

import numpy as np

import jax
import jax.numpy as jnp

from pvo_tpu.geom import projective
from pvo_tpu.geom.distance import frame_distance_bidirectional
from pvo_tpu.lie import se3


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4, 5, 6, 7),
                   static_argnames=("set_pose",))
def _append_frame(fmaps, nets, inps, segms, images, poses, disps,
                  intrinsics, ix, fmap, net, inp, segm, image, pose,
                  disp, intr, set_pose):
    """Batched keyframe write: ONE dispatch instead of ~8 scatters —
    matters when the accelerator sits behind a network tunnel."""
    fmaps = fmaps.at[ix].set(fmap.astype(fmaps.dtype))
    nets = nets.at[ix].set(net.astype(nets.dtype))
    inps = inps.at[ix].set(inp.astype(inps.dtype))
    segms = segms.at[ix].set(segm)
    images = images.at[ix].set(image)
    intrinsics = intrinsics.at[ix].set(intr)
    if set_pose:
        poses = poses.at[ix].set(pose)
        disps = disps.at[ix].set(disp)
    return fmaps, nets, inps, segms, images, poses, disps, intrinsics


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
        uniq, inv = np.unique(s, return_inverse=True)
        labels = np.cumsum(uniq != 0).astype(np.int32)  # rank, 1-based
        labels[uniq == 0] = 0
        labels[labels > self.max_segments - 1] = 0      # overflow -> 0
        return labels[inv].reshape(self.h, self.w)

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
        if fmap is not None and net is not None and inp is not None \
                and image is not None and intrinsics is not None:
            # fused keyframe write (one dispatch)
            s = jnp.zeros((self.h, self.w), jnp.int32) if segm is None \
                or not self.segm_filter else \
                jnp.asarray(self._remap_segments(segm))
            set_pose = pose is not None
            pose_v = jnp.asarray(
                pose if pose is not None else np.zeros(7), jnp.float32)
            disp_v = jnp.asarray(
                disp if disp is not None else
                np.ones((self.h, self.w)), jnp.float32)
            if jnp.ndim(disp_v) == 0:
                disp_v = jnp.full((self.h, self.w), disp_v)
            (self.fmaps, self.nets, self.inps, self.segms, self.images,
             self.poses, self.disps, self.intrinsics) = _append_frame(
                self.fmaps, self.nets, self.inps, self.segms,
                self.images, self.poses, self.disps, self.intrinsics,
                ix, jnp.asarray(fmap), jnp.asarray(net),
                jnp.asarray(inp), s, jnp.asarray(image, jnp.uint8),
                pose_v, disp_v, jnp.asarray(intrinsics, jnp.float32),
                set_pose=set_pose)
            return
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
