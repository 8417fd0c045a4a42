"""Per-op device trace of the test_vo2 export program (the DroidNet
15-iteration 2-frame window at 376x1248). Prints kbench device-op
totals — the stable perf signal on the relay (wall lies).

Usage: python -u scripts/trace_vo2.py [iters]
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

from scripts.kbench import device_time_ms  # noqa: E402


def main():
    import jax.numpy as jnp

    from pvo_tpu.vo.net.droidnet import DroidNet
    from pvo_tpu.vo.system import init_params, make_modules

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    H, W = 376, 1248
    h, w = H // 8, W // 8

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
    imgs = jnp.asarray(rng.randint(0, 255, (1, 2, H, W, 3), np.uint8))
    intr8 = jnp.asarray(np.tile(
        np.array([725.0087, 725.0087, 620.5, 187.0], np.float32) / 8.0,
        (1, 2, 1)))
    p2 = jnp.asarray(np.tile(
        np.array([0, 0, 0, 0, 0, 0, 1], np.float32), (1, 2, 1)))
    disps = jnp.ones((1, 2, h, w), jnp.float32)

    ms = device_time_ms(
        lambda: jfwd(params, p2, imgs, disps, intr8), top=30)
    print(f"total device {ms:.1f} ms / {iters} iters "
          f"= {ms / iters:.2f} ms/iter amortized")


if __name__ == "__main__":
    main()
