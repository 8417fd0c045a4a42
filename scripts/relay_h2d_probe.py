"""h2d stream cost vs size through the relay.

The relay acks block_until_ready early, so the only honest meter is a
blocking np.asarray that forces the whole stream. Per iteration:
upload S bytes -> dispatch a fixed device program -> np.asarray(out).
The per-iter delta vs S=0 is the stream cost of the upload.
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp


@jax.jit
def heavy(x, k):
    def body(i, c):
        return c @ x / 300.0 + c
    return jax.lax.fori_loop(0, k, body, x)[0, :16]


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2048, 2048), jnp.float32)
    np.asarray(heavy(x, 220))

    n = 10
    base = None
    for kb in (0, 4, 146, 582, 1164, 2328):
        a = (rng.randint(0, 255, (kb * 1024,), np.uint8)
             if kb else None)
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            if a is not None:
                d = jnp.asarray(a)
            o = heavy(x, 220)
            _ = np.asarray(o)
            ts.append((time.perf_counter() - t0) * 1e3)
            if a is not None:
                del d
        m = np.mean(ts[2:])
        if base is None:
            base = m
        print(f"  {kb:5d} KB: per-iter {m:7.1f} ms  "
              f"(delta {m - base:+6.1f})")

    # two separate uploads of 291KB each vs one 582KB
    a1 = rng.randint(0, 255, (291 * 1024,), np.uint8)
    a2 = rng.randint(0, 255, (291 * 1024,), np.uint8)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        d1 = jnp.asarray(a1)
        d2 = jnp.asarray(a2)
        o = heavy(x, 220)
        _ = np.asarray(o)
        ts.append((time.perf_counter() - t0) * 1e3)
        del d1, d2
    print(f"  2x291 KB: per-iter {np.mean(ts[2:]):7.1f} ms  "
          f"(delta {np.mean(ts[2:]) - base:+6.1f})")


if __name__ == "__main__":
    main()
