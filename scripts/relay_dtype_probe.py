"""Same 582KB payload, different dtypes: does the relay's h2d cost
depend on dtype (e.g. uint8 upcast on the wire) or only on bytes?
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

    raw = rng.randint(0, 255, (582 * 1024,), np.uint8)
    payloads = {
        "uint8  582KB": raw,
        "int8   582KB": raw.view(np.int8),
        "int32  582KB": raw.view(np.int32),
        "float32 582KB": raw.view(np.float32),
        "uint32 582KB": raw.view(np.uint32),
        "bf16-ish int16 582KB": raw.view(np.int16),
    }
    n = 10
    ts0 = []
    for _ in range(n):
        t0 = time.perf_counter()
        _ = np.asarray(heavy(x, 220))
        ts0.append((time.perf_counter() - t0) * 1e3)
    base = np.mean(ts0[2:])
    print(f"  no upload          : {base:7.1f} ms")
    for name, a in payloads.items():
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            d = jnp.asarray(a)
            _ = np.asarray(heavy(x, 220))
            ts.append((time.perf_counter() - t0) * 1e3)
            del d
        m = np.mean(ts[2:])
        print(f"  {name:19s}: {m:7.1f} ms (delta {m - base:+6.1f})")


if __name__ == "__main__":
    main()
