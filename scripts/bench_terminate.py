"""Benchmark: VOSystem.terminate (2 global-BA passes + trajectory
filler) at >= 100 keyframes on the available accelerator
(VERDICT round-1 weak #5: this stage had no measured number).

Tracks ~3N synthetic frames with keyframe-everything settings so the
video holds N keyframes, then times terminate() wall-clock (the stage
is a handful of long device programs, so wall-clock is representative
despite relay jitter; run twice and keep the second).

Usage: python -u scripts/bench_terminate.py [n_keyframes]
Prints one JSON line.
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


def run_once(n_kf, H=240, W=808):
    from pvo_tpu.utils.config import VOConfig
    from pvo_tpu.vo.system import VOSystem

    # +24: the trajectory filler stages 16-frame batches past the
    # keyframe rows; power-of-two buffer reuses the bench/profile
    # compiled-program family instead of a one-off recompile
    buf = 64
    while buf < n_kf + 24:
        buf *= 2
    cfg = VOConfig(image_size=(H, W), buffer=buf,
                   filter_thresh=0.01, keyframe_thresh=0.0,
                   warmup=12, segm_filter=True)
    sysm = VOSystem(cfg)
    frames = list(synth_stream(n_kf, H, W))
    for (t, img, intr, segm) in frames:
        sysm.track(t, img, intr, segments=segm)

    t0 = time.monotonic()
    traj = sysm.terminate(iter(frames))
    dt = time.monotonic() - t0
    # counter read AFTER terminate: under planner mode the host
    # mirror lags the device until disengage (terminate disengages)
    kf = sysm.video.counter
    assert np.all(np.isfinite(traj)), "terminate produced non-finite"
    # keyframe-everything settings must yield ~n_kf keyframes; a
    # collapsed count silently relabels the metric (round-4 advisor:
    # a '14 keyframes' artifact was committed for the n_kf=100 config)
    assert kf >= 0.9 * n_kf, \
        f"keyframe count collapsed: {kf} < 0.9*{n_kf}"
    return kf, dt


def main():
    n_kf = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    kf, cold = run_once(n_kf)
    # min over warm reps: the relay's latency drifts by the hour
    # (docs/PERF.md) — a single warm rep conflates queue mood with
    # the program's cost
    warms = []
    for _ in range(max(1, reps - 1)):
        kf, w = run_once(n_kf)
        warms.append(w)
        print(f"  warm rep: {w:.1f}s", flush=True)
    warm = min(warms)

    out = {
        "metric": "vo_terminate_seconds",
        "value": round(warm, 3),
        "unit": f"s @ {kf} keyframes, 240x808 (min of "
                f"{len(warms)} warm reps {[round(w, 1) for w in warms]};"
                f" cold {round(cold, 1)}s incl. compile)",
        # normalized against this bench's own round-3 measurement
        # (23.299 s warm @ 99 keyframes) — lower is better, so
        # vs_baseline > 1 means FASTER than round 3
        "vs_baseline": round(23.299 / warm, 3),
    }
    print(json.dumps(out))
    with open("BENCH_TERMINATE.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
