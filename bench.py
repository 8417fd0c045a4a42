"""Benchmark: VO frame throughput per chip (vkitti2 eval geometry).

Runs the full VO tracking loop (motion filter -> frontend: recurrent
update + fused DBA) on a synthetic stream at the vkitti2 eval resolution
(240x808, the test_vo.py protocol) and reports steady-state frames/sec
on the available accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: the reference publishes no speed numbers (BASELINE.md);
we normalize against a 10 fps envelope typical of DROID-SLAM-class CUDA
systems on the 11GB-GPU setup the reference documents (README.md:64),
so vs_baseline = fps / 10.
"""

import json
import os
import time

import numpy as np

import jax

# persistent compilation cache: the SLAM kernels compile per shape
# bucket; caching makes repeat benches measure runtime, not XLA
jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def synth_stream(n, H, W, seed=0):
    """Synthetic stream with a POPULATED panoptic segment map: ~90
    distinct ids per frame (4x4-cell grid at 1/8 res, shifting with
    the image) saturating the 96 static per-frame segment slots, so
    the segment-vote kernel and the host id-remap run at real
    occupancy — an all-zero map (round-3 bench) never exercised the
    remap or produced non-trivial votes."""
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 255, (H + 64, W + 64, 3), np.uint8)
    h, w = H // 8, W // 8
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    intr = np.array([725.0087 * W / 1242, 725.0087 * W / 1242,
                     W / 2.0, H / 2.0], np.float32)
    for t in range(n):
        dy, dx = (2 * t) % 64, (3 * t) % 64
        img = base[dy:dy + H, dx:dx + W]
        # vkitti-style global ids (cat*10000+inst), shifted per frame
        # like the image so segments track scene motion
        segm = ((((yy + t) // 4) * (w // 4 + 1) + (xx + 2 * t) // 4)
                % 90 + 1).astype(np.int32) * 10000 + 3
        yield t, img, intr, segm


def main():
    from pvo_tpu.utils.config import VOConfig
    from pvo_tpu.vo.system import VOSystem

    H, W = 240, 808
    # warmup must run PAST the first age-based retirements
    # (max_age=25): the retirement-plan shape buckets first appear at
    # frames ~25-32 and each costs a one-time compile-cache load; with
    # n_warm=24 those loads landed inside the measurement window
    n_warm, n_meas = 40, 30

    cfg = VOConfig(image_size=(H, W), buffer=128,
                   filter_thresh=0.01,      # admit every frame: worst case
                   keyframe_thresh=0.0,     # keep all keyframes
                   warmup=12, segm_filter=True)
    sysm = VOSystem(cfg)

    frames = list(synth_stream(n_warm + n_meas, H, W))

    # warmup: triggers initialization + all jit compilations
    for k, (t, img, intr, segm) in enumerate(frames[:n_warm]):
        sysm.track(t, img, intr, segments=segm)
        if k + 1 < len(frames):
            sysm.prefetch(frames[k + 1][1], frames[k + 1][3])

    jax.block_until_ready(sysm.video.poses)

    import sys
    per_frame = []
    t0 = time.perf_counter()
    for k, (t, img, intr, segm) in enumerate(frames[n_warm:]):
        f0 = time.perf_counter()
        sysm.track(t, img, intr, segments=segm)
        # double-buffered input: next frame's upload streams while
        # this frame's device program runs
        if n_warm + k + 1 < len(frames):
            sysm.prefetch(frames[n_warm + k + 1][1],
                          frames[n_warm + k + 1][3])
        per_frame.append(time.perf_counter() - f0)
    jax.block_until_ready(sysm.video.poses)
    dt = time.perf_counter() - t0
    print("per-frame times (async):",
          " ".join(f"{x:.2f}" for x in per_frame), file=sys.stderr)

    fps = n_meas / dt

    # MFU accounting (VERDICT round-3 #5): device-op trace of 3 more
    # frames + XLA cost analysis of the merged per-frame program,
    # against the chip's bf16 MXU peak
    device_ms = mfu = None
    if sysm.planner.engaged:
        import tempfile
        from scripts.kbench import _device_op_totals, peak_flops
        n_tr = 3
        extra = list(synth_stream(n_warm + n_meas + n_tr, H, W))
        with tempfile.TemporaryDirectory() as td:
            with jax.profiler.trace(td):
                for (t, img, intr, segm) in extra[-n_tr:]:
                    sysm.track(t, img, intr, segments=segm)
                jax.block_until_ready(sysm.video.poses)
            agg, _ = _device_op_totals(td)
        tot = sum(v for k, v in agg.items() if k.startswith("jit_"))
        device_ms = tot / 1e3 / n_tr
        t, img, intr, segm = extra[-1]
        prep = sysm.filterx.prepare(t + 1, img, intr, segm)
        c = sysm.planner.step_cost_analysis(prep)
        flops = float(c.get("flops", 0.0))
        mfu = flops / (device_ms / 1e3) / peak_flops()

    print(json.dumps({
        "metric": "vo_track_frames_per_sec",
        "value": round(fps, 3),
        "unit": "frames/s/chip @240x808 keyframe-everything, "
                "~90 segments/frame",
        "vs_baseline": round(fps / 10.0, 3),
        "device_ms_per_frame": round(device_ms, 2) if device_ms
        else None,
        "mfu_vs_bf16_peak": round(mfu, 4) if mfu else None,
    }))


if __name__ == "__main__":
    main()
