"""VPS throughput benchmark (reference tools/benchmark.py analog):
measures Panoptic FPN inference frames/sec (plain and fusion modes) on
the available accelerator.
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))



import argparse
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=375)
    p.add_argument("--width", type=int, default=1242)
    p.add_argument("--frames", type=int, default=20)
    p.add_argument("--fusion", action="store_true")
    args = p.parse_args()

    import jax
    import os
    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pvo_tpu.vps.panoptic_fpn import PanopticPredictor

    rng = np.random.RandomState(0)
    H, W = args.height, args.width
    predictor = PanopticPredictor(image_hw=(H, W))

    imgs = [rng.randint(0, 255, (H, W, 3)).astype(np.float32)
            for _ in range(args.frames + 3)]
    flow = rng.randn(H, W, 2).astype(np.float32) * 2

    # warmup both paths
    predictor(imgs[0], video_id="bench")
    if args.fusion:
        predictor(imgs[1], video_id="bench", flow=flow)

    t0 = time.perf_counter()
    for k in range(3, 3 + args.frames):
        predictor(imgs[k], video_id="bench",
                  flow=flow if args.fusion else None)
    dt = time.perf_counter() - t0

    print(json.dumps({
        "metric": "vps_frames_per_sec",
        "value": round(args.frames / dt, 3),
        "unit": f"frames/s @{H}x{W} "
                f"{'fusion' if args.fusion else 'plain'}",
        "vs_baseline": round(args.frames / dt / 5.0, 3),
    }))


if __name__ == "__main__":
    main()
