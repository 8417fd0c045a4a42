"""Tests for the correlation pyramid + windowed lookup."""

import jax
import jax.numpy as jnp
import numpy as np

from pvo_tpu.vo.net import corr as corr_ops

E, H, W, C = 2, 8, 12, 16
R = 3


def naive_lookup(vol, coords, radius):
    """Reference bilinear window sampling with zero out-of-bounds
    (semantics of the reference CUDA corr_index_forward)."""
    E_, HW1, H2, W2 = vol.shape
    out = np.zeros((E_, HW1, (2 * radius + 1) ** 2), np.float32)
    for e in range(E_):
        for p in range(HW1):
            x, y = coords[e, p]
            k = 0
            # dx-major tap order, matching the reference CUDA kernel
            # (correlation_kernels.cu:46-66)
            for dx in range(-radius, radius + 1):
                for dy in range(-radius, radius + 1):
                    xs, ys = x + dx, y + dy
                    x0, y0 = int(np.floor(xs)), int(np.floor(ys))
                    fx, fy = xs - x0, ys - y0
                    acc = 0.0
                    for (yy, xx, wgt) in [
                            (y0, x0, (1 - fy) * (1 - fx)),
                            (y0, x0 + 1, (1 - fy) * fx),
                            (y0 + 1, x0, fy * (1 - fx)),
                            (y0 + 1, x0 + 1, fy * fx)]:
                        if 0 <= yy < H2 and 0 <= xx < W2:
                            acc += wgt * vol[e, p, yy, xx]
                    out[e, p, k] = acc
                    k += 1
    return out


class TestCorr:
    def setup_method(self, _):
        key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        self.f1 = jax.random.normal(k1, (E, H, W, C), jnp.float32)
        self.f2 = jax.random.normal(k2, (E, H, W, C), jnp.float32)

    def test_volume_matches_einsum(self):
        vol = corr_ops.corr_volume(self.f1, self.f2)
        ref = np.einsum(
            "ehwc,eijc->ehwij",
            np.asarray(self.f1), np.asarray(self.f2)) / 16.0
        np.testing.assert_allclose(
            vol, ref.reshape(E, H * W, H, W), rtol=1e-5, atol=1e-5)

    def test_pyramid_shapes(self):
        pyr = corr_ops.build_pyramid(self.f1, self.f2, num_levels=4)
        assert [p.shape for p in pyr] == [
            (E, H * W, H, W), (E, H * W, H // 2, W // 2),
            (E, H * W, H // 4, W // 4), (E, H * W, H // 8, W // 8)]

    def test_lookup_matches_naive(self):
        pyr = corr_ops.build_pyramid(self.f1, self.f2, num_levels=2)
        key = jax.random.PRNGKey(3)
        coords = jnp.stack([
            jax.random.uniform(key, (E, H, W), minval=-2.0, maxval=W + 1.0),
            jax.random.uniform(key, (E, H, W), minval=-2.0, maxval=H + 1.0),
        ], axis=-1)
        out = np.asarray(corr_ops.lookup(pyr, coords, radius=R))
        cflat = np.asarray(coords).reshape(E, H * W, 2)
        ref0 = naive_lookup(np.asarray(pyr[0]), cflat, R)
        ref1 = naive_lookup(np.asarray(pyr[1]), cflat / 2.0, R)
        ref = np.concatenate([ref0, ref1], -1).reshape(E, H, W, -1)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    def test_lookup_at_grid_center_is_selfcorr(self):
        """At integer coords the center tap equals the raw volume."""
        pyr = corr_ops.build_pyramid(self.f1, self.f2, num_levels=1)
        from pvo_tpu.geom.projective import coords_grid
        coords = jnp.broadcast_to(coords_grid(H, W), (E, H, W, 2))
        out = corr_ops.lookup(pyr, coords, radius=R)
        center = out.reshape(E, H * W, 7, 7)[:, :, 3, 3]
        vol = np.asarray(pyr[0]).reshape(E, H * W, H * W)
        diag = np.stack([vol[e].diagonal() for e in range(E)])
        np.testing.assert_allclose(center, diag, rtol=1e-5, atol=1e-5)

    def test_chunked_matches_dense(self):
        F = 4
        key = jax.random.PRNGKey(7)
        fmaps = jax.random.normal(key, (F, H, W, C), jnp.float32)
        ii = jnp.array([0, 1, 2, 0, 3])
        jj = jnp.array([1, 2, 3, 2, 0])
        coords = jnp.full((5, H, W, 2), 3.5, jnp.float32)
        out_chunked = corr_ops.chunked_corr_lookup(
            fmaps, ii, jj, coords, chunk=2)
        out_dense = corr_ops.corr_and_lookup(
            fmaps[ii], fmaps[jj], coords)
        np.testing.assert_allclose(out_chunked, out_dense,
                                   rtol=1e-5, atol=1e-5)
