"""Characterize the remote-relay per-sync penalty.

Runs a ~100 ms dummy device program with a 4 KB output N times:
(a) pipelined — all dispatches queued, one readback at the end;
(b) synced — np.asarray after every dispatch (the tracking loop's
    structure: one blocking read per frame).

per-iter(b) - per-iter(a) = the relay's fixed cost per sync
(dispatch->start latency + d2h turnaround), i.e. the part of the
tracking loop's resolve_packet wait that no kernel work explains.
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
    return y[0, :1024]          # 4 KB packet


def main():
    x = jnp.asarray(np.random.RandomState(0).randn(2048, 2048),
                    jnp.float32)
    # calibrate k so one call ~= the fused step's ~95 ms device time
    k = 220
    heavy(x, k).block_until_ready()
    _ = np.asarray(heavy(x, k))

    n = 20
    # (a) pipelined
    t0 = time.perf_counter()
    outs = [heavy(x, k) for _ in range(n)]
    _ = np.asarray(outs[-1])
    t_pipe = (time.perf_counter() - t0) / n

    # (b) synced every iter
    t0 = time.perf_counter()
    for _ in range(n):
        o = heavy(x, k)
        try:
            o.copy_to_host_async()
        except AttributeError:
            pass
        _ = np.asarray(o)
    t_sync = (time.perf_counter() - t0) / n

    # (c) synced, no early copy
    t0 = time.perf_counter()
    for _ in range(n):
        _ = np.asarray(heavy(x, k))
    t_sync2 = (time.perf_counter() - t0) / n

    # (d) synced + a per-iter image-sized h2d (the tracking loop
    # uploads a 240x808x3 uint8 frame every step)
    img = np.random.RandomState(1).randint(
        0, 255, (240, 808, 3), np.uint8)
    t0 = time.perf_counter()
    for _ in range(n):
        up = jnp.asarray(img)
        o = heavy(x, k)
        _ = np.asarray(o)
        del up
    t_h2d = (time.perf_counter() - t0) / n

    print(f"pipelined per-iter : {t_pipe * 1e3:8.1f} ms")
    print(f"synced per-iter    : {t_sync * 1e3:8.1f} ms")
    print(f"synced (no copy)   : {t_sync2 * 1e3:8.1f} ms")
    print(f"synced + 582KB h2d : {t_h2d * 1e3:8.1f} ms")
    print(f"per-sync penalty   : {(t_sync - t_pipe) * 1e3:8.1f} ms")
    print(f"h2d 582KB cost     : {(t_h2d - t_sync) * 1e3:8.1f} ms")


if __name__ == "__main__":
    main()
