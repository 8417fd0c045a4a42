"""Shape/behavior tests for the VO network stack."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from pvo_tpu.geom.upsample import cvx_upsample, upsample_inter
from pvo_tpu.vo.net import (BasicEncoder, ConvGRU, DynamicUpdateModule,
                            GraphAgg)

KEY = jax.random.PRNGKey(0)


class TestEncoders:
    def test_fnet_shape(self):
        enc = BasicEncoder(output_dim=128, norm_fn="instance")
        x = jax.random.normal(KEY, (1, 2, 48, 64, 3), jnp.float32)
        params = enc.init(KEY, x)
        y = enc.apply(params, x)
        assert y.shape == (1, 2, 6, 8, 128)

    def test_cnet_shape_none_norm(self):
        enc = BasicEncoder(output_dim=256, norm_fn="none")
        x = jax.random.normal(KEY, (2, 48, 64, 3), jnp.float32)
        params = enc.init(KEY, x)
        y = enc.apply(params, x)
        assert y.shape == (2, 6, 8, 256)


class TestGRU:
    def test_hidden_update_bounded(self):
        gru = ConvGRU(128)
        net = jnp.tanh(jax.random.normal(KEY, (2, 6, 8, 128)))
        inp = jax.random.normal(KEY, (2, 6, 8, 320))
        params = gru.init(KEY, net, inp)
        out = gru.apply(params, net, inp)
        assert out.shape == net.shape
        assert float(jnp.abs(out).max()) <= 1.0 + 1e-5  # convex comb of tanh


class TestUpdateModule:
    def test_output_shapes(self):
        upd = DynamicUpdateModule()
        E, h, w = 3, 6, 8
        net = jnp.tanh(jax.random.normal(KEY, (E, h, w, 128)))
        inp = jax.random.normal(KEY, (E, h, w, 128))
        corr = jax.random.normal(KEY, (E, h, w, 196))
        motion = jax.random.normal(KEY, (E, h, w, 8))
        params = upd.init(KEY, net, inp, corr, motion)
        out = upd.apply(params, net, inp, corr, motion)
        assert out["net"].shape == (E, h, w, 128)
        for k in ("delta", "delta_dy", "weight_logits", "delta_mask"):
            assert out[k].shape == (E, h, w, 2), k

    def test_graph_agg_scatter_mean(self):
        agg = GraphAgg()
        E, h, w, F = 4, 6, 8, 3
        net = jax.random.normal(KEY, (E, h, w, 128))
        seg = jnp.array([0, 0, 2, 3])  # frame 1 has no edges; 3 = pad
        params = agg.init(KEY, net, seg, F)
        eta, upmask = agg.apply(params, net, seg, F)
        assert eta.shape == (F, h, w, 1)
        assert upmask.shape == (F, h, w, 576)
        assert float(eta.min()) >= 0.0  # softplus


class TestUpsample:
    def test_cvx_center_mask_replicates(self):
        B, H, W, D = 1, 3, 4, 2
        data = jax.random.normal(KEY, (B, H, W, D))
        mask = jnp.full((B, H, W, 9, 8, 8), -100.0)
        mask = mask.at[:, :, :, 4].set(100.0)  # center tap wins softmax
        up = cvx_upsample(data, mask.reshape(B, H, W, 576))
        assert up.shape == (B, 8 * H, 8 * W, D)
        ref = jnp.repeat(jnp.repeat(data, 8, axis=1), 8, axis=2)
        np.testing.assert_allclose(up, ref, atol=1e-5)

    def test_upsample_inter_matches_torch(self):
        torch = pytest.importorskip("torch")
        x = np.random.RandomState(0).rand(1, 5, 7, 3).astype(np.float32)
        ours = np.asarray(upsample_inter(jnp.asarray(x)))
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        ref = torch.nn.functional.interpolate(
            xt, scale_factor=8, mode="bilinear", align_corners=True,
            recompute_scale_factor=True).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)
