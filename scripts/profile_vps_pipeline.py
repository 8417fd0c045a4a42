"""Per-phase wall timing of the pipelined VPS submit/result protocol
(fusion mode): where do the non-overlapped milliseconds go — host prep,
h2d puts, dispatch, or the blocking result()? Run variants: plain,
fusion, fusion+depth, and fusion with device-resident flow/depth (the
PVO-loop mode where VO produced them on device already).
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pvo_tpu.vps.panoptic_fpn import PanopticPredictor

    rng = np.random.RandomState(0)
    H, W = 375, 1242
    imgs = [rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
            for _ in range(10)]
    flow = (rng.randn(H, W, 2) * 2).astype(np.float32)
    depth = (rng.rand(H, W) * 20 + 1).astype(np.float32)

    pred = PanopticPredictor(image_hw=(H, W), bf16=True)

    def run(label, flow_arg, depth_arg, frames=12):
        pred._video_id = None
        pred(imgs[0], video_id=label)
        if flow_arg is not None:
            pred(imgs[1], video_id=label, flow=flow_arg,
                 depth=depth_arg)
        t_sub, t_res = [], []
        pend = None
        t00 = time.perf_counter()
        for k in range(frames):
            t0 = time.perf_counter()
            nxt = pred.submit(imgs[2 + k % 6], video_id=label,
                              flow=flow_arg, depth=depth_arg)
            t1 = time.perf_counter()
            if pend is not None:
                pred.result(pend)
            t2 = time.perf_counter()
            pend = nxt
            t_sub.append(t1 - t0)
            t_res.append(t2 - t1)
        pred.result(pend)
        tot = time.perf_counter() - t00
        print(f"{label:22s} submit {np.mean(t_sub[2:])*1e3:7.1f} ms  "
              f"result {np.mean(t_res[2:])*1e3:7.1f} ms  "
              f"frame {tot/frames*1e3:7.1f} ms")

    run("plain", None, None)
    run("fusion", flow, None)
    run("fusion+depth", flow, depth)
    # device-resident flow/depth: what the integrated PVO loop can do
    fl_dev = jnp.asarray(flow.astype(np.float16))
    d_dev = jnp.asarray(depth)
    fl_dev.block_until_ready()
    run("fusion dev-flow", fl_dev, None)
    run("fusion dev-flow+d", fl_dev, d_dev)


if __name__ == "__main__":
    main()
