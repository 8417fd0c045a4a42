"""Pallas fused corr lookup vs the XLA reference path (interpret mode
on CPU; the same kernel compiles with Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvo_tpu.vo.net import corr as corr_ops
from pvo_tpu.vo.net.pallas_corr import pallas_corr_lookup

E, H, W, C = 2, 8, 12, 16


@pytest.mark.parametrize("num_levels", [1, 3])
def test_matches_xla_lookup(num_levels):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    f1 = jax.random.normal(k1, (E, H, W, C), jnp.float32)
    f2 = jax.random.normal(k2, (E, H, W, C), jnp.float32)
    coords = jnp.stack([
        jax.random.uniform(k3, (E, H, W), minval=-2.0, maxval=W + 1.0),
        jax.random.uniform(k3, (E, H, W), minval=-2.0, maxval=H + 1.0),
    ], axis=-1)

    ref = corr_ops.lookup(
        corr_ops.build_pyramid(f1, f2, num_levels), coords, radius=3)
    out = pallas_corr_lookup(f1, f2, coords, num_levels=num_levels,
                             blk=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_integer_coords_center_tap():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    f1 = jax.random.normal(k1, (1, H, W, C), jnp.float32)
    f2 = jax.random.normal(k2, (1, H, W, C), jnp.float32)
    from pvo_tpu.geom.projective import coords_grid
    coords = jnp.broadcast_to(coords_grid(H, W), (1, H, W, 2))
    out = pallas_corr_lookup(f1, f2, coords, num_levels=1, blk=32,
                             interpret=True)
    vol = np.einsum("ehwc,eijc->ehwij", np.asarray(f1),
                    np.asarray(f2)) / 16.0
    center = np.asarray(out).reshape(1, H, W, 7, 7)[..., 3, 3]
    diag = np.stack([vol[0, i, j, i, j] for i in range(H)
                     for j in range(W)]).reshape(1, H, W)
    np.testing.assert_allclose(center, diag, rtol=1e-4, atol=1e-5)
