"""Profile VOSystem.terminate stage-by-stage at backend scale.

VERDICT round-2 weak #2: terminate costs 55.9 s warm at 100 keyframes
and nobody measured WHERE. This instruments the stages (frontend flush,
per-pass backend normalize / proximity / update_lowmem device program,
trajectory-filler batches) with blocking timers so each number is a
real wall-clock slice on the accelerator.

Usage: python -u scripts/profile_terminate.py [n_keyframes] [reps]
"""

import json
import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from bench import synth_stream  # noqa: E402


class T:
    def __init__(self):
        self.rows = []

    def stamp(self, name, t0, sync=None):
        if sync is not None:
            jax.block_until_ready(sync)
        dt = time.monotonic() - t0
        self.rows.append((name, dt))
        print(f"  {name:40s} {dt:8.3f}s", flush=True)
        return time.monotonic()


def run(n_kf, H=240, W=808):
    from pvo_tpu.utils.config import VOConfig
    from pvo_tpu.vo.system import VOSystem

    # power-of-two buffer: reuses the bench-shape compiled programs
    # instead of paying a one-off recompile for an odd buffer size
    buf = 64
    while buf < n_kf + 24:
        buf *= 2
    cfg = VOConfig(image_size=(H, W), buffer=buf,
                   filter_thresh=0.01, keyframe_thresh=0.0,
                   warmup=12, segm_filter=True)
    sysm = VOSystem(cfg)
    frames = list(synth_stream(n_kf, H, W))
    t_tr = time.monotonic()
    for (t, img, intr, segm) in frames:
        sysm.track(t, img, intr, segments=segm)
        if t % 20 == 0:
            print(f"  track t={t} +{time.monotonic()-t_tr:.1f}s",
                  flush=True)
    print(f"  tracking total {time.monotonic()-t_tr:.1f}s", flush=True)

    tm = T()
    t0 = time.monotonic()
    sysm._sync()          # leave planner mode (blocking readback)
    t0 = tm.stamp("disengage", t0, sysm.video.poses)
    pending = getattr(sysm, "_pending_adm", None)
    if pending is not None:
        sysm.filterx.resolve_track(pending)
        sysm._pending_adm = None
    t0 = tm.stamp("resolve_track", t0)
    sysm.frontend()
    t0 = tm.stamp("frontend_last_update", t0, sysm.video.poses)
    sysm.frontend.flush()
    t0 = tm.stamp("frontend_flush", t0, sysm.video.poses)

    for steps in (7, 12):
        be = sysm.backend
        be.video.normalize()
        t0 = tm.stamp(f"backend{steps}.normalize", t0,
                      be.video.poses)

        import jax.numpy as jnp
        from pvo_tpu.vo.factor_graph import FactorGraph
        graph = FactorGraph(
            be.video, be.update_module, be.agg_module, be.params,
            max_edges=be.max_edges, max_inactive=1,
            corr_chunk=16, edge_chunk=be.edge_chunk,
            net_dtype=jnp.bfloat16,
            edge_buckets=(64, 128, 256, 512, 1024, 2048, 4096, 8192),
            pose_buckets=(32, 64, 128, 256, 512),
            pair_buckets=(512, 2048, 8192, 32768, 131072, 524288),
        )
        graph.add_proximity_factors(
            rad=be.cfg.backend_radius, nms=be.cfg.backend_nms,
            thresh=be.cfg.backend_thresh, beta=be.cfg.beta,
            max_new=be.max_edges // 2)
        t0 = tm.stamp(
            f"backend{steps}.proximity (E={graph.n_edges})", t0)

        for s in range(steps):
            graph.update_lowmem(steps=1)
            t0 = tm.stamp(f"backend{steps}.lowmem_step{s}", t0,
                          be.video.poses)
        graph.clear_edges()
        t0 = tm.stamp(f"backend{steps}.clear", t0)

    traj = sysm.traj_filler(iter(frames), sysm.filterx)
    t0 = tm.stamp("traj_filler", t0, None)
    total = sum(d for _, d in tm.rows)
    print(json.dumps({"total_s": round(total, 2), "n_kf": n_kf,
                      "stages": {k: round(v, 3) for k, v in tm.rows}}))


if __name__ == "__main__":
    n_kf = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    run(n_kf)
