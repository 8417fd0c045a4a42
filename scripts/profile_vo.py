"""Micro-profiler: time each jitted VO piece on the current backend.

Times (with block_until_ready) the correlation lookup (XLA gather vs
Pallas fused), the update operator, the fused DBA, and the end-to-end
fused graph step at the vkitti eval geometry — the numbers that decide
kernel strategy on TPU.
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))



import os
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(".jax_cache"))

import jax.numpy as jnp  # noqa: E402


def timeit(fn, *args, n=5, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    from pvo_tpu.vo.net import corr as corr_ops
    from pvo_tpu.vo.net.pallas_corr import pallas_corr_lookup

    E, H, W, C = 48, 30, 101, 128
    key = jax.random.PRNGKey(0)
    f1 = jax.random.normal(key, (E, H, W, C), jnp.bfloat16)
    f2 = jax.random.normal(key, (E, H, W, C), jnp.bfloat16)
    coords = jnp.stack([
        jax.random.uniform(key, (E, H, W), minval=0, maxval=W - 1),
        jax.random.uniform(key, (E, H, W), minval=0, maxval=H - 1),
    ], -1)
    F = 64
    fmaps = jax.random.normal(key, (F, H, W, C), jnp.bfloat16)
    ii = jnp.arange(E) % F
    jj = (jnp.arange(E) + 1) % F

    t_xla = timeit(lambda: corr_ops.chunked_corr_lookup(
        fmaps, ii, jj, coords, chunk=16))
    print(f"xla chunked corr lookup ({E} edges): {1e3 * t_xla:.1f} ms")

    try:
        t_pl = timeit(lambda: pallas_corr_lookup(f1, f2, coords))
        print(f"pallas fused corr lookup:          {1e3 * t_pl:.1f} ms")
    except Exception as e:
        print("pallas corr failed:", repr(e))

    # update operator
    from pvo_tpu.vo.net import DynamicUpdateModule
    upd = DynamicUpdateModule()
    net = jax.random.normal(key, (E, H, W, 128), jnp.float32)
    inp = jax.random.normal(key, (E, H, W, 128), jnp.float32)
    cr = jax.random.normal(key, (E, H, W, 196), jnp.float32)
    mo = jax.random.normal(key, (E, H, W, 8), jnp.float32)
    params = upd.init(key, net, inp, cr, mo)
    f = jax.jit(upd.apply)
    t_upd = timeit(f, params, net, inp, cr, mo)
    print(f"update operator ({E} edges):       {1e3 * t_upd:.1f} ms")

    # fused DBA
    from pvo_tpu.vo import dba as dba_mod
    Fb, h, w = 64, H, W
    poses = jnp.zeros((Fb, 7)).at[:, 6].set(1.0)
    disps = jnp.ones((Fb, h, w))
    intr = jnp.asarray([100.0, 100.0, w / 2, h / 2])
    target = jax.random.normal(key, (E, h, w, 2))
    weight = jnp.abs(jax.random.normal(key, (E, h, w, 2)))
    eta = 1e-4 * jnp.ones((32, h, w))
    valid = jnp.ones(E, bool)
    pa, pb, pv = dba_mod.build_edge_pairs(
        np.asarray(ii), np.asarray(valid), 512)
    t_dba = timeit(
        lambda: dba_mod.dba(poses, disps, intr, target, weight, eta,
                            ii.astype(jnp.int32), jj.astype(jnp.int32),
                            valid, jnp.asarray(pa), jnp.asarray(pb),
                            jnp.asarray(pv), 1, 32, 0, P=32, K=32,
                            iters=2))
    print(f"fused DBA (P=32, {E} edges, 2 it): {1e3 * t_dba:.1f} ms")


if __name__ == "__main__":
    main()
