"""VPS throughput benchmark (reference tools/benchmark.py analog):
measures Panoptic FPN inference frames/sec at the vkitti eval geometry
(375x1242) — plain, fusion, and bf16 modes — and prints ONE
BENCH-style JSON line. vs_baseline normalizes against the ~10 fps
GPU-class PanopticFPN R-50 envelope of the reference's 11 GB-GPU
operating point (README.md:64).
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))


import argparse
import json
import time

import numpy as np


def _measure(predictor, imgs, flow, frames, fusion):
    """Pipelined video protocol: one frame in flight (submit t+1
    before resolving t), so the ~90 ms of relay h2d/d2h per frame
    overlaps the next frame's device program."""
    predictor._video_id = None
    predictor(imgs[0], video_id="bench")
    if fusion:
        predictor(imgs[1], video_id="bench", flow=flow)
    t0 = time.perf_counter()
    pend = None
    for k in range(2, 2 + frames):
        nxt = predictor.submit(imgs[k], video_id="bench",
                               flow=flow if fusion else None)
        if pend is not None:
            predictor.result(pend)
        pend = nxt
    predictor.result(pend)
    return frames / (time.perf_counter() - t0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=375)
    p.add_argument("--width", type=int, default=1242)
    p.add_argument("--frames", type=int, default=20)
    p.add_argument("--skip-bf16", action="store_true")
    args = p.parse_args()

    import jax
    import os
    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pvo_tpu.vps.panoptic_fpn import PanopticPredictor

    rng = np.random.RandomState(0)
    H, W = args.height, args.width
    imgs = [rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
            for _ in range(args.frames + 3)]
    flow = (rng.randn(H, W, 2) * 2).astype(np.float32)

    predictor = PanopticPredictor(image_hw=(H, W))
    plain = _measure(predictor, imgs, flow, args.frames, fusion=False)
    fused = _measure(predictor, imgs, flow, args.frames, fusion=True)

    bf16 = None
    if not args.skip_bf16:
        pred16 = PanopticPredictor(params=predictor.params,
                                   image_hw=(H, W), bf16=True)
        bf16 = _measure(pred16, imgs, flow, args.frames, fusion=False)

    out = {
        "metric": "vps_frames_per_sec",
        "value": round(plain, 3),
        "unit": f"frames/s @{H}x{W} plain f32 (fusion "
                f"{round(fused, 2)}, bf16 "
                f"{round(bf16, 2) if bf16 else 'n/a'})",
        "vs_baseline": round(plain / 10.0, 3),
        "fusion_fps": round(fused, 3),
        "bf16_fps": round(bf16, 3) if bf16 else None,
    }
    print(json.dumps(out))
    with open("BENCH_VPS.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
