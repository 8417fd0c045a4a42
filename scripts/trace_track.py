"""Device-op trace of the steady-state tracking loop: runs the bench
loop, traces a few frames, prints the top device ops. The stable perf
signal under relay-latency drift (see docs/PERF.md).

Usage: python -u scripts/trace_track.py [n_traced_frames]
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import os
import sys

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    import tempfile

    from bench import synth_stream
    from scripts.kbench import _device_op_totals
    from pvo_tpu.utils.config import VOConfig
    from pvo_tpu.vo.system import VOSystem

    n_trace = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    H, W = 240, 808
    # past the first age-based retirements (same fix as bench.py)
    n_warm = 42

    cfg = VOConfig(image_size=(H, W), buffer=128,
                   filter_thresh=0.01, keyframe_thresh=0.0,
                   warmup=12, segm_filter=True)
    sysm = VOSystem(cfg)

    frames = list(synth_stream(n_warm + n_trace, H, W))
    for (t, img, intr, segm) in frames[:n_warm]:
        sysm.track(t, img, intr, segments=segm)

    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for (t, img, intr, segm) in frames[n_warm:]:
                sysm.track(t, img, intr, segments=segm)
            jax.block_until_ready(sysm.video.poses)
        agg, cnt = _device_op_totals(td)

    total = sum(v for k, v in agg.items() if k.startswith("jit_"))
    ms_frame = total / 1e3 / n_trace
    print(f"\n=== {n_trace} frames, device total "
          f"{total / 1e3:.1f} ms ({ms_frame:.1f} ms/frame) ===")
    for name, v in agg.most_common(40):
        print(f"  {v / 1e3:9.3f} ms {cnt[name]:5d}x  {name[:90]}")

    # MFU accounting (VERDICT round-3 #5): XLA cost analysis of the
    # merged per-frame program vs measured device time, normalized to
    # the chip's bf16 MXU peak
    if sysm.planner.engaged:
        from scripts.kbench import peak_flops
        t, img, intr, segm = frames[-1]
        prep = sysm.filterx.prepare(t + 1, img, intr, segm)
        c = sysm.planner.step_cost_analysis(prep)
        flops = float(c.get("flops", 0.0))
        peak = peak_flops()
        mfu = flops / (ms_frame / 1e3) / peak
        print(f"\nframe program: {flops / 1e9:.1f} GFLOP, device "
              f"{ms_frame:.1f} ms -> {flops / (ms_frame / 1e3) / 1e12:.2f}"
              f" TFLOP/s = {100 * mfu:.1f}% MFU (peak {peak / 1e12:.0f}"
              f" TFLOP/s bf16)")


if __name__ == "__main__":
    main()
