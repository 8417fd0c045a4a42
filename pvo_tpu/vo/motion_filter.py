"""Keyframe admission by predicted flow magnitude — single-dispatch.

Rebuild of the reference MotionFilter (VO_Module/droid_slam/
motion_filter.py): every incoming frame is encoded with fnet; a
single-edge correlation against the last keyframe plus one update-module
iteration estimates mean flow; frames exceeding the threshold become
keyframes.

TPU design: the WHOLE per-frame operation — feature encoding, motion
probe, conditional context encoding and conditional keyframe write —
is ONE jitted program with donated video buffers and a lax.cond on the
admission decision, so tracking a frame costs one device round-trip
(the admission scalar). The context encoder runs only in the admitted
branch, like the reference's lazy __context_encoder.
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


def pack_frame(image, seg_np=None, max_segments=256):
    """(H, W, 3) uint8 RGB -> 1-D uint8 upload buffer: packed planar
    YUV420, plus — when ``seg_np`` (h, w) remapped local segment ids
    are given — the segment map as uint8 tail bytes, so a single h2d
    transfer carries the whole frame (each separate upload dispatch
    costs ~1 ms through the remote relay)."""
    from pvo_tpu.utils.yuv import rgb_to_yuv420
    buf = rgb_to_yuv420(np.asarray(image))
    if seg_np is not None:
        assert max_segments <= 256, "uint8 segment tail"
        buf = np.concatenate(
            [buf, np.asarray(seg_np, np.uint8).ravel()])
    return buf


def _probe(params_update, update_apply, fmap_prev, gmap, net, inp):
    """Mean |flow delta| of one update iteration at zero flow
    (reference motion_filter.py:72-80)."""
    h, w = gmap.shape[:2]
    coords0 = projective.coords_grid(h, w)[None]
    from pvo_tpu.vo.factor_graph import _use_pallas_corr
    if _use_pallas_corr(h, w):
        from pvo_tpu.vo.net.pallas_corr import pallas_corr_lookup
        corr = pallas_corr_lookup(fmap_prev[None], gmap[None], coords0,
                                  packed=True)
    else:
        corr = corr_ops.corr_and_lookup(
            fmap_prev[None].astype(jnp.float32),
            gmap[None].astype(jnp.float32), coords0)
    cdt = jax.tree.leaves(params_update)[0].dtype
    motion = jnp.zeros((1, h, w, 8), cdt)
    out = update_apply(params_update, net[None].astype(cdt),
                       inp[None].astype(cdt), corr.astype(cdt), motion)
    return jnp.mean(jnp.linalg.norm(
        out["delta"].astype(jnp.float32), axis=-1))


def track_body(params, fmap_prev, net_prev, inp_prev,
               fmaps, nets, inps, segms, images, poses, disps,
               intrinsics,
               image, intr8, segm, ix, thresh,
               fnet_apply, cnet_apply, update_apply, first):
    """Traced per-frame body — one standalone device program via
    ``_track_kernel``, or inlined as the prologue of the merged
    track+frontend program (factor_graph._fused_step_mf).
    Returns (admitted, new filter
    state (fmap, net, inp), updated video buffers).

    ``image``: (H, W, 3) uint8 RGB, or (H*W*3//2,) packed planar
    YUV420 (half the upload bytes — utils/yuv.py) reconstructed to
    RGB here — optionally with the remapped segment map (uint8 local
    ids, h*w bytes) packed on the tail so one h2d carries both."""
    if image.ndim == 1:
        from pvo_tpu.utils.yuv import yuv420_to_rgb
        H_full, W_full = images.shape[1], images.shape[2]
        n_img = H_full * W_full * 3 // 2
        if image.shape[0] > n_img:
            h, w = segms.shape[1], segms.shape[2]
            segm = image[n_img:].reshape(h, w).astype(jnp.int32)
            image = image[:n_img]
        image = yuv420_to_rgb(image, H_full, W_full)
    x = normalize_images(image[None])
    gmap = fnet_apply(params["fnet"], x)[0]

    if first:
        admitted = jnp.asarray(True)
    else:
        delta = _probe(params["update"], update_apply, fmap_prev,
                       gmap, net_prev, inp_prev)
        admitted = delta > thresh

    def write(ops):
        (fmaps, nets, inps, segms, images, poses, disps,
         intrinsics) = ops
        ctx = cnet_apply(params["cnet"], x)[0]
        net, inp = jnp.split(ctx, 2, axis=-1)
        net = jnp.tanh(net)
        inp = jax.nn.relu(inp)

        fmaps = fmaps.at[ix].set(gmap.astype(fmaps.dtype))
        nets = nets.at[ix].set(net.astype(nets.dtype))
        inps = inps.at[ix].set(inp.astype(inps.dtype))
        segms = segms.at[ix].set(segm)
        images = images.at[ix].set(image)
        intrinsics = intrinsics.at[ix].set(intr8)
        if first:
            poses = poses.at[ix].set(
                jnp.array([0, 0, 0, 0, 0, 0, 1], poses.dtype))
            disps = disps.at[ix].set(
                jnp.ones(disps.shape[1:], disps.dtype))
        return ((fmaps, nets, inps, segms, images, poses, disps,
                 intrinsics), (gmap, net, inp))

    def skip(ops):
        return (ops, (fmap_prev, net_prev, inp_prev))

    bufs = (fmaps, nets, inps, segms, images, poses, disps, intrinsics)
    bufs, state = jax.lax.cond(admitted, write, skip, bufs)
    return admitted, state, bufs


_track_kernel = functools.partial(
    jax.jit,
    donate_argnums=(4, 5, 6, 7, 8, 9, 10, 11),
    static_argnames=("fnet_apply", "cnet_apply", "update_apply",
                     "first", "thresh"))(track_body)


class MotionFilter:
    def __init__(self, modules, params, video, thresh=2.5):
        self.fnet_apply = modules["fnet"].apply
        self.cnet_apply = modules["cnet"].apply
        self.update_apply = modules["update"].apply
        upd = params["update"]
        from pvo_tpu.vo.factor_graph import _use_pallas_corr
        if _use_pallas_corr(video.h, video.w):
            from pvo_tpu.vo.net.pallas_corr import packed_update_params
            upd = packed_update_params(upd)
        self.params = {"fnet": params["fnet"], "cnet": params["cnet"],
                       "update": upd}
        self.video = video
        self.thresh = thresh
        self.count = 0
        h, w = video.h, video.w
        self._fmap = jnp.zeros((h, w, 128), jnp.float32)
        self._net = jnp.zeros((h, w, 128), jnp.float32)
        self._inp = jnp.zeros((h, w, 128), jnp.float32)
        # per-stream upload caches: intrinsics and the no-segments
        # placeholder are constant across frames — uploading them once
        # removes two small h2d transfers per tracked frame
        self._intr_cache = (None, None)
        self._zero_segm = None
        # upload frames as packed planar YUV420 (half the h2d bytes;
        # set by VOSystem from VOConfig.yuv420_upload)
        self.yuv420 = False

    def _features(self, image):
        """Standalone fnet encode (used by the trajectory filler)."""
        x = normalize_images(jnp.asarray(image, jnp.uint8)[None])
        return self.fnet_apply(self.params["fnet"], x)[0]

    def prepare(self, tstamp, image, intrinsics, segments=None,
                force=False):
        """Host-side per-frame packing (no device dispatch): returns
        the track_body kernel arguments, consumed either by
        :meth:`track_async` (standalone program) or by the merged
        track+frontend program (factor_graph._fused_step_mf)."""
        v = self.video
        first = v.counter == 0
        if self._zero_segm is None:
            self._zero_segm = jnp.zeros((v.h, v.w), jnp.int32)
        segm = self._zero_segm
        thresh = -1.0 if force else float(self.thresh)

        n_img = v.images.shape[1] * v.images.shape[2] * 3 // 2
        prepacked = (isinstance(image, jax.Array) and image.ndim == 1
                     and image.shape[0] > n_img)
        if not prepacked:
            seg_np = None
            if segments is not None and v.segm_filter:
                seg_np = v._remap_segments(segments)
            if self.yuv420 and getattr(image, "ndim", 3) == 3 and \
                    not isinstance(image, jax.Array):
                # segment map rides the packed frame upload (one h2d)
                tail = seg_np if v.max_segments <= 256 else None
                image = pack_frame(image, tail, v.max_segments)
                seg_np = None if tail is not None else seg_np
            if seg_np is not None:
                segm = jnp.asarray(seg_np)

        key = tuple(np.asarray(intrinsics, np.float64).tolist())
        if self._intr_cache[0] != key:
            self._intr_cache = (
                key, jnp.asarray(intrinsics, jnp.float32) / 8.0)
        intr8 = self._intr_cache[1]
        return {"image": jnp.asarray(image, jnp.uint8), "intr8": intr8,
                "segm": segm, "thresh": thresh, "first": first,
                "tstamp": float(tstamp)}

    def commit_async(self, admitted, state):
        """Store the new filter state and queue the admission bit's
        d2h NOW: by the time the host reads it (next frame, pipelined
        choreography) the transfer has long completed, so
        resolve_track costs ~0 instead of a round-trip."""
        self._fmap, self._net, self._inp = state
        try:
            admitted.copy_to_host_async()
        except AttributeError:
            pass

    def track_async(self, tstamp, image, intrinsics, segments=None,
                    force=False, prep=None):
        """Dispatch the per-frame program WITHOUT waiting for the
        admission decision. The kernel conditionally writes the
        keyframe at slot ``counter`` on device; the host learns whether
        it did in :meth:`resolve_track`. This lets the caller overlap
        the admission round-trip with the previous frame's fused
        frontend program (system.py track choreography)."""
        v = self.video
        if prep is None:
            prep = self.prepare(tstamp, image, intrinsics, segments,
                                force)

        (admitted, state,
         (v.fmaps, v.nets, v.inps, v.segms, v.images, v.poses,
          v.disps, v.intrinsics)) = _track_kernel(
            self.params, self._fmap, self._net, self._inp,
            v.fmaps, v.nets, v.inps, v.segms, v.images, v.poses,
            v.disps, v.intrinsics,
            prep["image"], prep["intr8"], prep["segm"], v.counter,
            prep["thresh"],
            fnet_apply=self.fnet_apply, cnet_apply=self.cnet_apply,
            update_apply=self.update_apply, first=prep["first"])
        self.commit_async(admitted, state)
        return (admitted, prep["tstamp"])

    def resolve_track(self, pending):
        """Read the admission bit of a :meth:`track_async` dispatch and
        commit the host-side counter/tstamp."""
        admitted, tstamp = pending
        v = self.video
        ok = bool(admitted)
        if ok:
            v.tstamp[v.counter] = tstamp
            v.counter += 1
            self.count = 0
        else:
            self.count += 1
        return ok

    def track(self, tstamp, image, intrinsics, segments=None,
              force=False):
        """image: (H, W, 3) uint8 RGB; intrinsics (4,) full-res."""
        return self.resolve_track(self.track_async(
            tstamp, image, intrinsics, segments, force))

    def track_all(self, tstamp, image, intrinsics, segments=None):
        """Admit every frame (reference track_vo,
        motion_filter.py:91-108)."""
        return self.track(tstamp, image, intrinsics, segments,
                          force=True)
