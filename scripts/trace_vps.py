"""Device-op trace of the VPS dense program (plain and fusion) via
kbench: the only trustworthy per-op timing through the relay. Prints
total device ms/frame and the top ops, so optimization lands on real
device time rather than relay noise.
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import os

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pvo_tpu.vps.panoptic_fpn import PanopticPredictor
    from scripts.kbench import device_time_ms

    rng = np.random.RandomState(0)
    H, W = 375, 1242
    img = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
    flow = (rng.randn(H, W, 2) * 2).astype(np.float32)

    pred = PanopticPredictor(image_hw=(H, W), bf16=True)

    ph, pw = (-H) % 32, (-W) % 32
    x = jnp.asarray(np.pad(img, ((0, ph), (0, pw), (0, 0)))[None])
    fl = jnp.asarray(flow.astype(np.float16))
    x.block_until_ready()

    _, _, feats = pred._apply(pred.params, x)
    jax.block_until_ready(feats)

    print("=== plain ===")
    ms = device_time_ms(lambda: pred._apply(pred.params, x), top=60)
    print(f"plain device total {ms:.1f} ms")

    print("=== fusion (dev flow) ===")
    ms = device_time_ms(
        lambda: pred._apply(pred.params, x, feats, fl, None,
                            None, None, None,
                            bitcompat=False, depth_proj=False),
        top=60)
    print(f"fusion device total {ms:.1f} ms")


if __name__ == "__main__":
    main()
