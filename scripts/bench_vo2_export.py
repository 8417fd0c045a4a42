"""Benchmark the test_vo2 flow/depth export step (reference
VO_Module/evaluation_scripts/test_vo2.py:109-115): DroidNet on one
2-frame window at 376x1248 (1/8-res 47x156 -> x-tiled Pallas corr),
15 iterations, GT-pose init. Round-2 VERDICT weak #5: the recorded
15 s/pair predates the x-tiled kernel; this re-measures it.

Prints one JSON line {"metric": "vo2_export_seconds_per_pair", ...}.
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import json
import os
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    import jax.numpy as jnp

    from pvo_tpu.vo.net.droidnet import DroidNet
    from pvo_tpu.vo.system import init_params, make_modules

    H, W = 376, 1248
    h, w = H // 8, W // 8
    iters = 15

    params_split = init_params(make_modules(), (64, 96))
    params = {"params": {
        k: params_split[k]["params"]
        for k in ("fnet", "cnet", "update", "agg")}}
    model = DroidNet()

    ii = np.array([0, 1])
    jj = np.array([1, 0])

    def fwd(params, p2, imgs, disps, intr8):
        out = model.apply(params, p2, imgs, disps, intr8, ii, jj,
                          num_steps=iters, ret_flow=True,
                          downsample=True, final_only=True,
                          corr_impl="pallas")
        return out["flows"][-1], out["disps_up"][-1]

    jfwd = jax.jit(fwd)

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(
        rng.randint(0, 255, (1, 2, H, W, 3), np.uint8))
    intr8 = jnp.asarray(np.tile(
        np.array([725.0087, 725.0087, 620.5, 187.0], np.float32) / 8.0,
        (1, 2, 1)))
    p2 = jnp.asarray(np.tile(
        np.array([0, 0, 0, 0, 0, 0, 1], np.float32), (1, 2, 1)))
    disps = jnp.ones((1, 2, h, w), jnp.float32)

    t0 = time.perf_counter()
    flows, disps_up = jfwd(params, p2, imgs, disps, intr8)
    jax.block_until_ready(flows)
    cold = time.perf_counter() - t0

    # one throwaway warm pair: the first post-compile readback pays a
    # one-off relay stall unrelated to steady-state export speed
    flows, disps_up = jfwd(params, p2, imgs, disps, intr8)
    np.asarray(flows[0, 0])
    np.asarray(disps_up[0, 0, 3::8, 3::8])

    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        flows, disps_up = jfwd(params, p2, imgs, disps, intr8)
        # the CLI reads both outputs back per pair
        np.asarray(flows[0, 0])
        np.asarray(disps_up[0, 0, 3::8, 3::8])
    warm = (time.perf_counter() - t0) / n

    out = {
        "metric": "vo2_export_seconds_per_pair",
        "value": round(warm, 3),
        "unit": "s/pair @376x1248, 15 iters, incl. per-pair readback"
                " (cold %.1f s incl. compile)" % cold,
        # normalized against this bench's own round-1 measurement
        # (~15 s/pair pre-x-tiling); > 1 means faster than round 1
        "vs_baseline": round(15.0 / warm, 3),
    }
    print(json.dumps(out))
    with open("BENCH_VO2.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
