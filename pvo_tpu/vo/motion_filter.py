"""Keyframe admission by predicted flow magnitude.

Rebuild of the reference MotionFilter (VO_Module/droid_slam/
motion_filter.py): every incoming frame is encoded with fnet; a
single-edge correlation against the last keyframe plus one update-module
iteration estimates mean flow; frames exceeding the threshold become
keyframes (context-encoded and appended to the video).

Both the probe and the encoders are single jitted programs; the
keyframe decision is one scalar transferred to the host per frame.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from pvo_tpu.geom import projective
from pvo_tpu.lie import se3
from pvo_tpu.vo.net import corr as corr_ops
from pvo_tpu.vo.net.droidnet import normalize_images


@functools.partial(jax.jit, static_argnames=("fnet_apply",))
def _encode_features(params, image, fnet_apply):
    x = normalize_images(image[None])
    return fnet_apply(params, x)[0]


@functools.partial(jax.jit, static_argnames=("cnet_apply",))
def _encode_context(params, image, cnet_apply):
    x = normalize_images(image[None])
    ctx = cnet_apply(params, x)[0]
    net, inp = jnp.split(ctx, 2, axis=-1)
    return jnp.tanh(net), jax.nn.relu(inp)


@functools.partial(jax.jit, static_argnames=("update_apply",))
def _probe_motion(params, fmap_prev, gmap, net, inp, update_apply):
    """Mean |flow delta| of one update iteration at zero flow
    (reference motion_filter.py:72-80)."""
    h, w = gmap.shape[:2]
    coords0 = projective.coords_grid(h, w)[None]
    from pvo_tpu.vo.factor_graph import _use_pallas_corr
    if _use_pallas_corr():
        from pvo_tpu.vo.net.pallas_corr import pallas_corr_lookup
        corr = pallas_corr_lookup(fmap_prev[None], gmap[None], coords0)
    else:
        corr = corr_ops.corr_and_lookup(
            fmap_prev[None].astype(jnp.float32),
            gmap[None].astype(jnp.float32), coords0)
    motion = jnp.zeros((1, h, w, 8), jnp.float32)
    out = update_apply(params, net[None].astype(jnp.float32),
                       inp[None].astype(jnp.float32), corr, motion)
    return jnp.mean(jnp.linalg.norm(out["delta"], axis=-1))


class MotionFilter:
    def __init__(self, modules, params, video, thresh=2.5):
        """modules: dict with 'fnet', 'cnet', 'update' flax modules;
        params: dict with matching param trees."""
        self.fnet_apply = modules["fnet"].apply
        self.cnet_apply = modules["cnet"].apply
        self.update_apply = modules["update"].apply
        self.params = params
        self.video = video
        self.thresh = thresh
        self.count = 0
        self._fmap = None
        self._net = None
        self._inp = None

    def _features(self, image):
        return _encode_features(self.params["fnet"], image,
                                fnet_apply=self.fnet_apply)

    def _context(self, image):
        return _encode_context(self.params["cnet"], image,
                               cnet_apply=self.cnet_apply)

    def track(self, tstamp, image, intrinsics, segments=None):
        """image: (H, W, 3) uint8 RGB; intrinsics at FULL resolution."""
        image = jnp.asarray(image, jnp.uint8)
        gmap = self._features(image)
        intr8 = jnp.asarray(intrinsics, jnp.float32) / 8.0

        if self.video.counter == 0:
            net, inp = self._context(image)
            self._fmap, self._net, self._inp = gmap, net, inp
            self.video.append(
                tstamp, image, pose=np.asarray(se3.identity()),
                disp=1.0 * np.ones((self.video.h, self.video.w),
                                   np.float32),
                intrinsics=intr8, fmap=gmap, net=net, inp=inp,
                segm=segments)
            return True

        delta = float(_probe_motion(
            self.params["update"], self._fmap, gmap, self._net,
            self._inp, update_apply=self.update_apply))

        if delta > self.thresh:
            self.count = 0
            net, inp = self._context(image)
            self._fmap, self._net, self._inp = gmap, net, inp
            self.video.append(tstamp, image, pose=None, disp=None,
                              intrinsics=intr8, fmap=gmap, net=net,
                              inp=inp, segm=segments)
            return True
        self.count += 1
        return False

    def track_all(self, tstamp, image, intrinsics, segments=None):
        """Admit every frame (reference track_vo,
        motion_filter.py:91-108)."""
        image = jnp.asarray(image, jnp.uint8)
        gmap = self._features(image)
        net, inp = self._context(image)
        intr8 = jnp.asarray(intrinsics, jnp.float32) / 8.0
        if self.video.counter == 0:
            self.video.append(
                tstamp, image, pose=np.asarray(se3.identity()),
                disp=np.ones((self.video.h, self.video.w), np.float32),
                intrinsics=intr8, fmap=gmap, net=net, inp=inp,
                segm=segments)
        else:
            self.video.append(tstamp, image, pose=None, disp=None,
                              intrinsics=intr8, fmap=gmap, net=net,
                              inp=inp, segm=segments)
        return True
