"""Micro-bench: Pallas corr-lookup variants (device time via kbench).

Usage: python scripts/bench_corr.py [E] [H] [W]
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from scripts.kbench import device_time_ms  # noqa: E402


def main():
    E = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 101

    rng = np.random.RandomState(0)
    C = 128
    f1 = jnp.asarray(rng.randn(E, H, W, C), jnp.bfloat16)
    f2 = jnp.asarray(rng.randn(E, H, W, C), jnp.bfloat16)
    coords = jnp.asarray(
        rng.rand(E, H, W, 2) * np.array([W - 1, H - 1]), jnp.float32)

    from pvo_tpu.vo.net import pallas_corr as pc

    def run(packed):
        fn = jax.jit(lambda a, b, c: pc.pallas_corr_lookup(
            a, b, c, packed=packed))
        ms = device_time_ms(lambda: fn(f1, f2, coords), top=6)
        print(f"pallas packed={packed}: {ms:.3f} ms device")

    run(True)
    run(False)


if __name__ == "__main__":
    main()
