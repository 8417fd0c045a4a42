"""Per-stage wall-time breakdown of the steady-state tracking loop.

Monkey-patches timers around the motion filter, topology ops, fused
update dispatches, and sync points of a bench.py-identical run, then
prints mean ms/frame per stage. This is the decision tool for the
round-2 perf work (VERDICT weak #2: no committed per-stage breakdown).
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import os
import time
from collections import defaultdict

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


TIMES = defaultdict(list)


def timed(name, fn):
    def wrap(*a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        TIMES[name].append(time.perf_counter() - t0)
        return out
    return wrap


def main():
    from bench import synth_stream
    from pvo_tpu.utils.config import VOConfig
    from pvo_tpu.vo.system import VOSystem
    from pvo_tpu.vo import factor_graph as fg_mod
    from pvo_tpu.vo import frontend as fe_mod

    H, W = 240, 808
    # warmup must run past the first age-based retirements (~frames
    # 25-32): their shape-bucket cache loads cost seconds each on this
    # 1-core host (same fix as bench.py)
    n_warm, n_meas = 40, 30

    cfg = VOConfig(image_size=(H, W), buffer=128,
                   filter_thresh=0.01, keyframe_thresh=0.0,
                   warmup=12, segm_filter=True)
    sysm = VOSystem(cfg)

    g = sysm.frontend.graph
    v = sysm.video

    # --- instrument ---
    sysm.filterx.track_async = timed("motion_filter(dispatch)",
                                     sysm.filterx.track_async)
    sysm.filterx.resolve_track = timed("resolve_track(sync)",
                                       sysm.filterx.resolve_track)
    g.rm_factors = timed("rm_factors", g.rm_factors)
    g.add_proximity_factors = timed("add_proximity",
                                    g.add_proximity_factors)
    v.distance = timed("video.distance(sync)", v.distance)
    g._fused = timed("fused_step(dispatch)", g._fused)
    fe = sysm.frontend
    orig_rp = fe._resolve_packet

    def rp():
        t0 = time.perf_counter()
        out = orig_rp()
        TIMES["resolve_packet(sync)"].append(time.perf_counter() - t0)
        return out
    fe._resolve_packet = rp

    orig_update = fe_mod.Frontend._update

    def upd(self, *a, **k):
        t0 = time.perf_counter()
        out = orig_update(self, *a, **k)
        TIMES["frontend_total"].append(time.perf_counter() - t0)
        return out
    sysm.frontend._update = upd.__get__(sysm.frontend)

    frames = list(synth_stream(n_warm + n_meas, H, W))
    for k, (t, img, intr, segm) in enumerate(frames[:n_warm]):
        sysm.track(t, img, intr, segments=segm)
        if k + 1 < len(frames):
            sysm.prefetch(frames[k + 1][1], frames[k + 1][3])
    jax.block_until_ready(sysm.video.poses)
    for k in TIMES:
        TIMES[k].clear()

    t0 = time.perf_counter()
    for k, (t, img, intr, segm) in enumerate(frames[n_warm:]):
        f0 = time.perf_counter()
        sysm.track(t, img, intr, segments=segm)
        if n_warm + k + 1 < len(frames):
            sysm.prefetch(frames[n_warm + k + 1][1],
                          frames[n_warm + k + 1][3])
        TIMES["frame_total"].append(time.perf_counter() - f0)
    jax.block_until_ready(sysm.video.poses)
    wall = time.perf_counter() - t0

    print(f"\n{n_meas} frames in {wall:.2f}s = {n_meas / wall:.2f} fps")
    print(f"{'stage':28s} {'mean ms':>9s} {'total ms':>9s} {'calls':>6s}")
    for k, ts in sorted(TIMES.items(),
                        key=lambda kv: -sum(kv[1])):
        print(f"{k:28s} {1e3 * np.mean(ts):9.1f} "
              f"{1e3 * np.sum(ts):9.1f} {len(ts):6d}")


if __name__ == "__main__":
    main()
