"""Break down the VPS fusion path: per-variant program time with a
forced d2h round-trip (the relay's block_until_ready is unreliable —
np.asarray of a small output leaf is the only trustworthy fence),
vs isolated h2d costs. Separates relay transfer costs from device
compute so optimization effort lands on the right side.
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
    img = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
    flow = (rng.randn(H, W, 2) * 2).astype(np.float32)
    depth = (rng.rand(H, W) * 20 + 1).astype(np.float32)

    pred = PanopticPredictor(image_hw=(H, W), bf16=True)

    ph = (-H) % 32
    pw = (-W) % 32
    imgp = np.pad(img, ((0, ph), (0, pw), (0, 0)))
    x = jnp.asarray(imgp[None])
    fl16 = jnp.asarray(flow.astype(np.float16))
    d32 = jnp.asarray(depth)
    np.asarray(jnp.sum(x) + jnp.sum(fl16) + jnp.sum(d32))  # fence

    def timeit(fn, n=8):
        out = fn()
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]  # warm fence
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        # fence on a tiny leaf (dets scores) — forces the queue
        small = jax.tree.leaves(out)[0]
        np.asarray(small).ravel()[:1]
        return (time.perf_counter() - t0) / n

    def run_plain():
        s, dets, f = pred._apply(pred.params, x)
        return dets["scores"]

    def run_fuse(dd):
        _, _, feats = pred._apply(pred.params, x)
        # feats stays on device; reuse captured
        return feats

    _, _, feats = pred._apply(pred.params, x)
    np.asarray(jax.tree.leaves(feats)[0]).ravel()[:1]

    def fuse(dd):
        s, dets, f = pred._apply(pred.params, x, feats, fl16, dd,
                                 None, None, None,
                                 bitcompat=False, depth_proj=False)
        return dets["scores"]

    t_plain = timeit(run_plain)
    t_fuse = timeit(lambda: fuse(None))
    t_fused = timeit(lambda: fuse(d32))

    def h2d(arr):
        def go():
            a = jnp.asarray(arr)
            return jnp.sum(a)
        return timeit(go)

    t_img = h2d(imgp)
    t_f16 = h2d(flow.astype(np.float16))
    t_f32 = h2d(flow)
    t_dep = h2d(depth)

    print(f"prog plain (+tiny d2h)   {t_plain*1e3:8.1f} ms")
    print(f"prog fusion              {t_fuse*1e3:8.1f} ms"
          f"   (+{(t_fuse-t_plain)*1e3:.1f})")
    print(f"prog fusion+depth        {t_fused*1e3:8.1f} ms"
          f"   (+{(t_fused-t_plain)*1e3:.1f})")
    print(f"h2d+sum image uint8      {t_img*1e3:8.1f} ms")
    print(f"h2d+sum flow f16         {t_f16*1e3:8.1f} ms")
    print(f"h2d+sum flow f32         {t_f32*1e3:8.1f} ms")
    print(f"h2d+sum depth f32        {t_dep*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
