"""Device-time micro-bench of the fused DBA at tracking shapes.

Usage: python -u scripts/bench_dba.py [E] [P] [K] [iters]
"""

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from scripts.kbench import device_time_ms  # noqa: E402
from pvo_tpu.vo import dba as dba_mod  # noqa: E402


def main():
    E = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    P = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    F, h, w = 128, 30, 101

    rng = np.random.RandomState(0)
    poses = np.zeros((F, 7), np.float32)
    poses[:, 6] = 1.0
    poses[:, :3] = 0.05 * rng.randn(F, 3)
    disps = (1.0 + 0.1 * rng.rand(F, h, w)).astype(np.float32)
    intr = np.array([100.0, 100.0, w / 2, h / 2], np.float32)

    n_real = E - 4
    ii = rng.randint(0, 24, n_real)
    jj = (ii + 1 + rng.randint(0, 3, n_real)) % 25
    ii = np.pad(ii, (0, E - n_real)).astype(np.int32)
    jj = np.pad(jj, (0, E - n_real)).astype(np.int32)
    valid = np.zeros(E, bool)
    valid[:n_real] = True

    target = (rng.rand(E, h, w, 2) *
              np.array([w, h])).astype(np.float32)
    weight = rng.rand(E, h, w, 2).astype(np.float32)
    eta = 0.01 * np.ones((K, h, w), np.float32)

    pa, pb, pv = dba_mod.build_edge_pairs(ii, valid, 512)

    def run():
        return dba_mod.dba(
            jnp.asarray(poses), jnp.asarray(disps), jnp.asarray(intr),
            jnp.asarray(target), jnp.asarray(weight), jnp.asarray(eta),
            jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(valid),
            jnp.asarray(pa), jnp.asarray(pb), jnp.asarray(pv),
            0, 25, 0, P=P, K=K, iters=iters)

    ms = device_time_ms(run, top=25)
    print(f"dba E={E} P={P} K={K} iters={iters}: {ms:.3f} ms")


if __name__ == "__main__":
    main()
