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


def test_droidnet_remat_matches_plain():
    """remat=True (reference-recipe 15-iter memory mode) computes the
    same function: step-0 outputs agree to float-fusion noise and the
    1-step loss gradient agrees. NOT bit-identical — rematerialization
    changes XLA fusion boundaries, so 1-ulp rounding differences
    appear and the recurrent BA amplifies them across iterations
    (later steps drift like any 1-ulp perturbation would)."""
    import jax
    import jax.numpy as jnp

    from pvo_tpu.parallel import data_parallel as dp
    from pvo_tpu.vo.net.droidnet import DroidNet

    model = DroidNet()
    F = 3
    ii, jj = dp._ring(F)
    b = dp.make_synthetic_batch(1, F=F, H=48, W=64, seed=0)
    s = jax.tree.map(lambda x: jnp.asarray(x[0]), b)
    p = model.init(jax.random.PRNGKey(0), s["poses_init"],
                   s["images"], s["disps_init"], s["intrinsics"],
                   ii, jj, num_steps=1)

    def fwd(remat, n):
        return model.apply(p, s["poses_init"], s["images"],
                           s["disps_init"], s["intrinsics"], ii, jj,
                           num_steps=n, ret_flow=True,
                           downsample=True, remat=remat)

    o1, o2 = fwd(False, 1), fwd(True, 1)
    for k in ("poses", "disps_up", "residuals", "flows"):
        np.testing.assert_allclose(np.asarray(o1[k][0]),
                                   np.asarray(o2[k][0]),
                                   rtol=2e-3, atol=5e-3)

    def loss(pp, remat):
        o = model.apply(pp, s["poses_init"], s["images"],
                        s["disps_init"], s["intrinsics"], ii, jj,
                        num_steps=1, ret_flow=True, downsample=True,
                        remat=remat)
        return (sum(jnp.sum(x ** 2) for x in o["residuals"]) +
                sum(jnp.sum(x) for x in o["disps_up"]))

    g1 = jax.grad(lambda pp: loss(pp, False))(p)
    g2 = jax.grad(lambda pp: loss(pp, True))(p)
    gnorm = float(np.sqrt(sum(float((np.asarray(x) ** 2).sum())
                              for x in jax.tree.leaves(g1))))
    for a, c in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        # elementwise equality is not attainable (refusion noise
        # through two BA solves); require direction + magnitude
        # agreement per weight tensor, skipping leaves whose grad is
        # noise-level (heads unused by this loss get exact-0-or-ulp
        # grads whose direction is meaningless)
        a = np.asarray(a, np.float64).ravel()
        c = np.asarray(c, np.float64).ravel()
        na, nc = np.linalg.norm(a), np.linalg.norm(c)
        if max(na, nc) < 1e-4 * gnorm:
            continue
        cos = float(a @ c / max(na * nc, 1e-30))
        assert cos > 0.99, (cos, na, nc)
        assert 0.95 < na / max(nc, 1e-30) < 1.05, (na, nc)


def test_droidnet_final_only_matches_full():
    """final_only=True (inference shortcut used by the vo2 export,
    scripts/test_vo2.py) returns BIT-identical last-iteration
    disps_up/masks_up/flows: the skipped upsamples have no feedback
    into the recurrence, so the traced program for the kept outputs
    is the same graph."""
    import jax
    import jax.numpy as jnp

    from pvo_tpu.parallel import data_parallel as dp
    from pvo_tpu.vo.net.droidnet import DroidNet

    model = DroidNet()
    F = 3
    ii, jj = dp._ring(F)
    b = dp.make_synthetic_batch(1, F=F, H=48, W=64, seed=1)
    s = jax.tree.map(lambda x: jnp.asarray(x[0]), b)
    p = model.init(jax.random.PRNGKey(0), s["poses_init"],
                   s["images"], s["disps_init"], s["intrinsics"],
                   ii, jj, num_steps=1)

    def fwd(final_only):
        return model.apply(p, s["poses_init"], s["images"],
                           s["disps_init"], s["intrinsics"], ii, jj,
                           num_steps=3, ret_flow=True,
                           downsample=True, final_only=final_only)

    full, last = jax.jit(lambda: fwd(False))(), \
        jax.jit(lambda: fwd(True))()
    assert len(last["disps_up"]) == 1 and len(full["disps_up"]) == 3
    for k in ("disps_up", "masks_up", "flows"):
        np.testing.assert_array_equal(np.asarray(full[k][-1]),
                                      np.asarray(last[k][-1]))
    # the recurrence itself is untouched
    for k in ("poses", "residuals"):
        assert len(last[k]) == 3
        np.testing.assert_array_equal(np.asarray(full[k][-1]),
                                      np.asarray(last[k][-1]))
