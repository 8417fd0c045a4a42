"""The fused step's hoisted GRU context precompute must be numerically
equivalent to the full update-op apply (conv linearity; see
factor_graph.split_gru_ctx_params)."""

import numpy as np
import jax
import jax.numpy as jnp

from pvo_tpu.vo import factor_graph as fg
from pvo_tpu.vo.system import init_params, make_modules


def test_ctx_split_matches_full_apply():
    E, h, w = 3, 8, 12
    rng = np.random.RandomState(0)
    mods = make_modules()
    params = init_params(mods, image_size=(h * 8, w * 8))
    p_up = params["update"]
    p_nc, ctx_k = fg.split_gru_ctx_params(p_up)

    net = jnp.asarray(rng.randn(E, h, w, 128), jnp.float32)
    inp = jnp.asarray(rng.randn(E, h, w, 128), jnp.float32)
    corr = jnp.asarray(rng.randn(E, h, w, 196), jnp.float32)
    motn = jnp.asarray(rng.randn(E, h, w, 8), jnp.float32)

    full = mods["update"].apply(p_up, net, inp, corr, motn)
    pre = fg.gru_ctx_pre(ctx_k, inp)
    split = mods["update"].apply(p_nc, net, None, corr, motn,
                                 ctx_pre=pre)
    for k in full:
        np.testing.assert_allclose(np.asarray(full[k]),
                                    np.asarray(split[k]),
                                    atol=5e-5, rtol=1e-5)


def test_ctx_split_idempotent_tree():
    # the sliced tree keeps every other leaf identical (converter /
    # checkpoint compatibility) and the slices recompose the original
    mods = make_modules()
    params = init_params(mods, image_size=(64, 96))
    p_up = params["update"]
    p_nc, ctx_k = fg.split_gru_ctx_params(p_up)
    for gate in ("convz", "convr", "convq"):
        k_full = p_up["params"]["gru"][gate]["Conv_0"]["kernel"]
        k_nc = p_nc["params"]["gru"][gate]["Conv_0"]["kernel"]
        lo, hi = fg.GRU_CTX_LO, fg.GRU_CTX_HI
        recomposed = jnp.concatenate(
            [k_nc[:, :, :lo], ctx_k[gate], k_nc[:, :, lo:]], axis=2)
        np.testing.assert_array_equal(np.asarray(recomposed),
                                      np.asarray(k_full))
        b_full = p_up["params"]["gru"][gate]["Conv_0"]["bias"]
        b_nc = p_nc["params"]["gru"][gate]["Conv_0"]["bias"]
        np.testing.assert_array_equal(np.asarray(b_full),
                                      np.asarray(b_nc))
