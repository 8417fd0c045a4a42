"""The VO system facade: track / terminate, like the reference Droid.

Rebuild of the reference Droid class (VO_Module/droid_slam/droid.py):
wires MotionFilter -> Frontend -> Backend -> TrajectoryFiller around a
shared DepthVideo, loads converted weights, and exposes
``track(t, image, intrinsics, segments)`` + ``terminate(stream)``.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from pvo_tpu.geom.upsample import upsample_inter
from pvo_tpu.lie import se3
from pvo_tpu.utils.config import VOConfig
from pvo_tpu.vo.backend import Backend
from pvo_tpu.vo.factor_graph import FactorGraph
from pvo_tpu.vo.frontend import Frontend
from pvo_tpu.vo.motion_filter import MotionFilter
from pvo_tpu.vo.net import (BasicEncoder, DynamicUpdateModule, GraphAgg)
from pvo_tpu.vo.trajectory_filler import TrajectoryFiller
from pvo_tpu.vo.video import DepthVideo


# storage dtype of the per-edge GRU hidden state (the reference holds
# video.nets in fp16, depth_video.py:44); parity tests pin f32 to keep
# the classic-vs-planner comparison tight under random weights
NET_STORE_DTYPE = jnp.bfloat16


@functools.lru_cache(maxsize=2)
def make_modules(use_aff_bri=False):
    """Process-wide singleton module set.

    Flax modules are stateless, but they hash by IDENTITY — and the
    bound ``.apply`` methods are STATIC arguments of every jitted
    program in the system (motion filter, fused step, planner,
    filler). Fresh modules per VOSystem therefore missed every jit
    cache and re-traced the whole program family per instance: ~15 s
    of host tracing per system on this 1-core box, which dominated
    the measured warm terminate (profile_terminate round 5:
    frontend_last_update 18.2 s, traj_filler 25.5 s of a 60 s run —
    almost all of it repeated tracing, the device work is ~2 s)."""
    return {
        "fnet": BasicEncoder(output_dim=128, norm_fn="instance"),
        "cnet": BasicEncoder(output_dim=256, norm_fn="none"),
        "update": DynamicUpdateModule(use_aff_bri),
        "agg": GraphAgg(),
    }


def init_params(modules, image_size=(48, 64), seed=0):
    """Random-initialized parameter trees (used when no checkpoint is
    given, e.g. for benchmarking and tests)."""
    key = jax.random.PRNGKey(seed)
    H, W = image_size
    h, w = H // 8, W // 8
    img = jnp.zeros((1, H, W, 3), jnp.float32)
    net = jnp.zeros((1, h, w, 128), jnp.float32)
    inp = jnp.zeros((1, h, w, 128), jnp.float32)
    corr = jnp.zeros((1, h, w, 196), jnp.float32)
    motion = jnp.zeros((1, h, w, 8), jnp.float32)
    seg = jnp.zeros((1,), jnp.int32)
    ks = jax.random.split(key, 4)
    # jit each init: flax .init otherwise executes eagerly — hundreds
    # of individual device dispatches, which costs MINUTES through a
    # high-latency device tunnel (one compiled program each instead)
    return {
        "fnet": jax.jit(modules["fnet"].init)(ks[0], img),
        "cnet": jax.jit(modules["cnet"].init)(ks[1], img),
        "update": jax.jit(modules["update"].init)(
            ks[2], net, inp, corr, motion),
        "agg": jax.jit(modules["agg"].init,
                       static_argnums=(3,))(ks[3], net, seg, 1),
    }


class VOSystem:
    """End-to-end visual odometry (the reference's `Droid`)."""

    def __init__(self, cfg: Optional[VOConfig] = None, params=None,
                 weights_path: Optional[str] = None):
        self.cfg = cfg or VOConfig()
        self.modules = make_modules(self.cfg.use_aff_bri)

        if params is None and weights_path is not None:
            from pvo_tpu.utils.convert import load_droidnet_torch
            params = load_droidnet_torch(weights_path)
        if params is None:
            params = init_params(self.modules, self.cfg.image_size)
        self.params = params

        # bf16 compute for the recurrent operator on accelerators
        # (the reference runs it under fp16 autocast); geometry/BA
        # stays fp32
        if self.cfg.dtype_features == "bfloat16" and \
                jax.default_backend() != "cpu":
            # ONE jitted program for the whole cast: the eager
            # tree.map dispatched ~100 individual astype ops, each
            # paying a relay round-trip (minutes of per-process setup
            # when the tunnel latency spikes)
            cast = jax.jit(lambda t: jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, t))
            graph_params = {"update": cast(params["update"]),
                            "agg": cast(params["agg"])}
        else:
            graph_params = {"update": params["update"],
                            "agg": params["agg"]}

        self.video = DepthVideo(
            image_size=self.cfg.image_size, buffer=self.cfg.buffer,
            segm_filter=self.cfg.segm_filter, thresh=self.cfg.thresh,
            max_segments=self.cfg.max_segments)

        self.filterx = MotionFilter(self.modules, params, self.video,
                                    thresh=self.cfg.filter_thresh)
        H, W = self.cfg.image_size
        self.filterx.yuv420 = (self.cfg.yuv420_upload and
                               H % 2 == 0 and W % 2 == 0)

        # edge buckets: 48 matches the reference frontend cap exactly
        # (droid_frontend.py:14 max_factors=48), so the steady-state
        # fused step carries zero padding; bigger buckets only serve
        # initialization bursts
        graph = FactorGraph(
            self.video, self.modules["update"], self.modules["agg"],
            graph_params, max_edges=self.cfg.max_edges,
            max_inactive=self.cfg.max_inactive,
            max_factors=48,  # reference droid_frontend.py:14
            beta=self.cfg.beta,
            # NOTE: keep buckets coarse — finer pose/pair buckets were
            # tried and the combinatorial shape variants caused
            # mid-sequence recompiles that cost far more than the
            # padding they saved
            edge_buckets=tuple(sorted({32, 48, self.cfg.max_edges})),
            # bf16 hidden-state storage matches the reference's fp16
            # video.nets buffers (depth_video.py:44) and removes the
            # f32<->bf16 convert+update-slice pair (~1.5 ms/frame);
            # NET_STORE_DTYPE is a module knob so numerics-sensitive
            # parity tests can pin f32
            net_dtype=NET_STORE_DTYPE)
        self.frontend = Frontend(graph, self.video, self.cfg)
        self.backend = Backend(self.video, self.cfg,
                               self.modules["update"],
                               self.modules["agg"], graph_params)
        self.traj_filler = TrajectoryFiller(self.video, {
            "update": self.modules["update"],
            "agg": self.modules["agg"]}, graph_params)

        # device-resident steady-state topology (vo/planner.py):
        # engaged after initialization; the per-frame host packet
        # sync disappears entirely
        from pvo_tpu.vo.planner import PlannerDriver
        self.planner = PlannerDriver(self)

    def prefetch(self, image, segments=None):
        """Queue the NEXT frame's upload now (double-buffered
        streaming input). Call right after :meth:`track` returns: the
        ~0.3 MB h2d then streams over the otherwise-idle link while
        this frame's device program runs, instead of serializing in
        front of the next frame's dispatch (~25 ms/frame through a
        remote relay, docs/PERF.md). The next :meth:`track` call must
        pass the same frame. When ``segments`` is given, the remapped
        segment map rides the same packed transfer."""
        self._pref_key = image.shape
        v = self.video
        if self.filterx.yuv420 and image.ndim == 3:
            from pvo_tpu.vo.motion_filter import pack_frame
            seg_np = None
            if segments is not None and v.segm_filter and \
                    v.max_segments <= 256:
                seg_np = v._remap_segments(segments)
            self._pref = jnp.asarray(
                pack_frame(image, seg_np, v.max_segments))
        else:
            self._pref = jnp.asarray(image, jnp.uint8)

    def track(self, tstamp, image, intrinsics, segments=None):
        """image: (H, W, 3) uint8 RGB at cfg.image_size;
        intrinsics: (4,) [fx, fy, cx, cy] at full resolution.

        Pipelined choreography (one keyframe of latency, zero change to
        the device-program sequence): each call (frame t)
          1. commits frame t-1's admission bit — a FREE read, its d2h
             completed during the last frame;
          2. dispatches frame t's motion-filter program (speculative
             append at the committed counter);
          3. resolves the pending packet (keyframe removal + distance
             matrix, from the fused program dispatched last frame — by
             now it has ridden out a full frame of device time) and
             dispatches the fused update FOR KEYFRAME t-1.
        The fused update for keyframe k therefore runs while frame k+1
        arrives: the wall cost per frame is the device time itself, not
        device + round-trip + host as in the serialized ordering. The
        per-keyframe program sequence and all its inputs (topology,
        distance-matrix lag, removal timing) are identical to the
        serialized form — this is pure re-timing."""
        pref = getattr(self, "_pref", None)
        if pref is not None and \
                getattr(self, "_pref_key", None) == image.shape:
            image = pref
            self._pref = None
        if self.planner.engaged:
            return self.planner.track(tstamp, image, intrinsics,
                                      segments)
        pending = getattr(self, "_pending_adm", None)
        if pending is not None:
            self.filterx.resolve_track(pending)
        fx = self.filterx
        fe = self.frontend
        if fe.is_initialized and fe.t1 < self.video.counter:
            # steady state: the motion-filter work rides the fused
            # frontend program — ONE dispatch per frame (round-3 merge;
            # the standalone mf dispatch cost ~5-6 ms/frame of jit-call
            # overhead through the remote relay)
            prep = fx.prepare(tstamp, image, intrinsics, segments)
            mf = dict(prep, params=fx.params, fmap=fx._fmap,
                      net=fx._net, inp=fx._inp,
                      fnet_apply=fx.fnet_apply,
                      cnet_apply=fx.cnet_apply)
            mf_out = fe(mf=mf)
            if mf_out is not None:
                admitted, state = mf_out
                fx.commit_async(admitted, state)
                self._pending_adm = (admitted, prep["tstamp"])
            else:
                # frontend had no edges to update: fall back to the
                # standalone motion-filter program
                self._pending_adm = fx.track_async(
                    tstamp, image, intrinsics, segments, prep=prep)
            # switch the steady state to the device-resident topology
            # loop: one blocking sync here, then zero per-frame syncs.
            # precheck() consults only host mirrors — a persistently
            # blocked stream keeps the classic one-frame-lag pipeline
            # instead of paying a blocking resolve every frame, and
            # retries on a cooldown (vo/planner.py precheck).
            if self.cfg.pipeline and not self.planner.engaged and \
                    self.planner.precheck():
                self.filterx.resolve_track(self._pending_adm)
                self._pending_adm = None
                fe.resolve()
                if self.planner.can_engage():
                    self.planner.engage()
                else:
                    self.planner.cooldown = \
                        self.planner.RETRY_COOLDOWN
        else:
            self._pending_adm = fx.track_async(
                tstamp, image, intrinsics, segments)
            self.frontend()

    def terminate(self, image_stream=None, need_inv=True,
                  backend_steps=(7, 12)):
        """Run global BA passes and fill non-keyframe poses.

        Returns (T, 7) [t, q] trajectory (w2c if need_inv=False)."""
        if self.planner.engaged:
            self.planner.disengage()
        pending = getattr(self, "_pending_adm", None)
        if pending is not None:
            self.filterx.resolve_track(pending)
            self._pending_adm = None
        self.frontend()          # fused update for the last keyframe
        self.frontend.flush()
        for steps in backend_steps:
            self.backend(steps)

        if image_stream is None:
            traj = np.asarray(self.video.poses[:self.video.counter])
        else:
            traj = self.traj_filler(image_stream, self.filterx)
        if need_inv:
            traj = np.asarray(se3.inv(jnp.asarray(traj)))
        return traj

    # ---------- accessors (reference droid.py:94-104) ----------

    def _sync(self):
        """State reads outside the track loop: leave planner mode so
        the host mirrors (counter, topology) are current."""
        if self.planner.engaged:
            self.planner.disengage()

    def get_traj(self):
        self._sync()
        return np.asarray(self.video.poses[:self.video.counter])

    def get_depth(self):
        self._sync()
        t = self.video.counter
        d = self.video.disps[:t][..., None]
        return np.asarray(upsample_inter(d)[..., 0])

    def get_flow(self):
        self._sync()
        t = self.video.counter
        return np.asarray(upsample_inter(
            self.video.full_flow[:t] * 8.0))
