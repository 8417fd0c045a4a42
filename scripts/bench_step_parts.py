"""Device-time breakdown of one _update_core step's components at
tracking-loop shapes (E=48, 30x101), measured on the real chip via
kbench traces. Decides where the next fused-step milliseconds go."""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import os

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from scripts.kbench import device_time_ms


def main():
    from pvo_tpu.vo import factor_graph as fgm
    from pvo_tpu.vo.system import make_modules, init_params
    from pvo_tpu.geom import projective

    E, h, w, F = 48, 30, 101, 32
    K = 32
    S_MAX = 96
    rng = np.random.RandomState(0)

    mods = make_modules()
    params = init_params(mods, image_size=(h * 8, w * 8))
    upd_params = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.bfloat16), params["update"])
    agg_params = params["agg"]

    netb = jnp.asarray(rng.randn(E, h, w, 128), jnp.float32)
    inp = jnp.asarray(rng.randn(E, h, w, 128), jnp.bfloat16)
    corr = jnp.asarray(rng.randn(E, h, w, 196), jnp.bfloat16)
    motn = jnp.asarray(rng.randn(E, h, w, 8), jnp.bfloat16)
    segm = jnp.asarray(rng.randint(0, S_MAX, (E, h, w)), jnp.int32)
    bin_mask = jnp.asarray(rng.rand(E, h, w, 2) > 0.3)
    valid = jnp.ones((E,), bool)

    poses = jnp.asarray(np.tile(
        np.array([0, 0, 0, 0, 0, 0, 1], np.float32), (F, 1)))
    disps = jnp.asarray(rng.rand(F, h, w).astype(np.float32) + 0.5)
    intr = jnp.asarray(np.array([100.0, 100.0, 50.0, 15.0], np.float32))
    ii = jnp.asarray(rng.randint(0, K - 1, (E,)), jnp.int32)
    jj = ii + 1

    f_upd = jax.jit(lambda p, n, i, c, m: mods["update"].apply(
        p, n.astype(jnp.bfloat16), i, c, m))
    f_segvote = jax.jit(lambda b, s, v: fgm.segment_vote_filter(
        b, s, v, S_MAX, 0.5))
    intr_b = jnp.broadcast_to(intr, (1, F, 4))
    f_proj = jax.jit(lambda p, d: projective.projective_transform(
        p[None], d[None], intr_b, ii, jj)[0][0])
    m = ii.astype(jnp.int32)
    f_agg = jax.jit(lambda p, n: mods["agg"].apply(p, n, m, K))

    print("update_apply   :",
          device_time_ms(lambda: f_upd(upd_params, netb, inp, corr,
                                       motn)), "ms")
    print("segment_vote   :",
          device_time_ms(lambda: f_segvote(bin_mask, segm, valid)),
          "ms")
    print("proj_transform :",
          device_time_ms(lambda: f_proj(poses, disps)), "ms")
    print("graph_agg      :",
          device_time_ms(lambda: f_agg(agg_params,
                                       netb.astype(jnp.float32))),
          "ms")


if __name__ == "__main__":
    main()
