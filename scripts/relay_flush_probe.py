"""Does the relay start executing a dispatched program eagerly, or
only when a blocking call flushes the queue?

dispatch -> host sleep(150ms) -> np.asarray:
  eager start  => read returns in ~RTT (program long finished)
  lazy flush   => read returns in device_time + RTT

Also tests whether an is_ready() poke right after dispatch forces the
flush (a cheap way to get eager behavior from user code if the relay
is lazy).
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
    y = jax.lax.fori_loop(0, k, body, x)
    return y[0, :1024]


def main():
    x = jnp.asarray(np.random.RandomState(0).randn(2048, 2048),
                    jnp.float32)
    k = 220
    heavy(x, k).block_until_ready()

    def timed_read(o):
        t0 = time.perf_counter()
        _ = np.asarray(o)
        return (time.perf_counter() - t0) * 1e3

    n = 8
    for name, poke in (("plain dispatch        ", None),
                       ("dispatch + is_ready() ", "ready"),
                       ("dispatch + async copy ", "copy")):
        waits = []
        for _ in range(n):
            o = heavy(x, k)
            if poke == "ready":
                try:
                    o.is_ready()
                except AttributeError:
                    pass
            elif poke == "copy":
                try:
                    o.copy_to_host_async()
                except AttributeError:
                    pass
            time.sleep(0.15)         # a full frame of host time
            waits.append(timed_read(o))
        print(f"{name}: read-after-sleep "
              f"{np.mean(waits[2:]):6.1f} ms  "
              f"(all: {' '.join(f'{w:.0f}' for w in waits)})")


if __name__ == "__main__":
    main()
