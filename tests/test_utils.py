"""Tests for IO codecs and trajectory metrics."""

import numpy as np
import jax.numpy as jnp

from pvo_tpu.utils.ate import ate_rmse, umeyama_alignment
from pvo_tpu.utils.io import (decode_vkitti_flow, id2rgb, rgb2id)


class TestCodecs:
    def test_id_rgb_roundtrip(self):
        ids = np.array([[0, 1, 255], [256, 70000, 16777215]], np.uint32)
        np.testing.assert_array_equal(rgb2id(id2rgb(ids)), ids)

    def test_vkitti_flow_decode(self):
        h, w = 4, 6
        bgr = np.zeros((h, w, 3), np.uint16)
        # mid-range encodes zero flow
        mid = (2 ** 16 - 1) // 2
        bgr[..., 2] = mid + 1  # u channel ~ 0
        bgr[..., 1] = mid + 1
        bgr[..., 0] = 1        # valid
        flow, valid = decode_vkitti_flow(bgr)
        np.testing.assert_allclose(flow, 0.0, atol=0.01 * max(h, w))
        np.testing.assert_array_equal(valid, 1.0)

    def test_flow_extremes(self):
        bgr = np.zeros((3, 5, 3), np.uint16)
        bgr[..., 2] = 2 ** 16 - 1   # u = +(w-1)
        flow, _ = decode_vkitti_flow(bgr)
        np.testing.assert_allclose(flow[..., 0], 4.0, atol=1e-3)
        np.testing.assert_allclose(flow[..., 1], -2.0, atol=1e-3)


class TestATE:
    def test_umeyama_recovers_similarity(self):
        rng = np.random.RandomState(0)
        src = rng.randn(50, 3)
        # random rotation
        q, _ = np.linalg.qr(rng.randn(3, 3))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        s_true, t_true = 2.5, np.array([1.0, -2.0, 0.5])
        dst = s_true * (q @ src.T).T + t_true
        s, R, t = umeyama_alignment(src, dst)
        assert abs(s - s_true) < 1e-9
        np.testing.assert_allclose(R, q, atol=1e-9)
        np.testing.assert_allclose(t, t_true, atol=1e-9)
        assert ate_rmse(src, dst) < 1e-9

    def test_ate_detects_error(self):
        rng = np.random.RandomState(1)
        ref = rng.randn(30, 3)
        est = ref + 0.1 * rng.randn(30, 3)
        r = ate_rmse(est, ref)
        assert 0.02 < r < 0.3


class TestYUV420:
    """utils/yuv.py: the half-bandwidth frame-ingest codec."""

    def test_roundtrip_error_bounded(self):
        from pvo_tpu.utils.yuv import rgb_to_yuv420, yuv420_to_rgb
        rng = np.random.RandomState(0)
        # smooth image: chroma subsampling error should be tiny
        base = rng.randn(8, 26, 3)
        img = np.clip(
            128 + 40 * np.kron(base, np.ones((8, 8, 1))), 0, 255
        ).astype(np.uint8)[:, :200]
        packed = rgb_to_yuv420(img)
        assert packed.shape == (img.shape[0] * img.shape[1] * 3 // 2,)
        assert packed.dtype == np.uint8
        rec = np.asarray(yuv420_to_rgb(jnp.asarray(packed),
                                       img.shape[0], img.shape[1]))
        err = np.abs(rec.astype(int) - img.astype(int))
        assert err.mean() < 1.5, err.mean()
        assert np.percentile(err, 99) <= 6

    def test_gray_is_lossless_mod_rounding(self):
        from pvo_tpu.utils.yuv import rgb_to_yuv420, yuv420_to_rgb
        rng = np.random.RandomState(1)
        g = rng.randint(0, 255, (16, 24, 1), np.uint8)
        img = np.repeat(g, 3, axis=2)
        rec = np.asarray(yuv420_to_rgb(
            jnp.asarray(rgb_to_yuv420(img)), 16, 24))
        assert np.abs(rec.astype(int) - img.astype(int)).max() <= 2
