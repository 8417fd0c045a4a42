"""Tests for detection ops: NMS, ROIAlign, box transforms."""

import jax.numpy as jnp
import numpy as np

from pvo_tpu.vps import ops


class TestBoxes:
    def test_encode_decode_roundtrip(self):
        rng = np.random.RandomState(0)
        src = np.abs(rng.rand(10, 4)) * 50
        src[:, 2:] = src[:, :2] + 10 + 20 * rng.rand(10, 2)
        tgt = src + rng.randn(10, 4) * 3
        tgt[:, 2:] = np.maximum(tgt[:, 2:], tgt[:, :2] + 1)
        d = ops.encode_boxes(jnp.asarray(src), jnp.asarray(tgt))
        back = ops.decode_boxes(d, jnp.asarray(src))
        np.testing.assert_allclose(back, tgt, atol=1e-4)

    def test_iou_identity(self):
        b = jnp.asarray([[0., 0., 10., 10.], [5., 5., 15., 15.]])
        iou = ops.box_iou(b, b)
        np.testing.assert_allclose(np.diag(iou), 1.0)
        assert 0.1 < float(iou[0, 1]) < 0.2  # 25/175


class TestNMS:
    def test_suppresses_overlaps(self):
        boxes = jnp.asarray([
            [0., 0., 10., 10.],
            [1., 1., 11., 11.],     # overlaps box 0
            [50., 50., 60., 60.],   # separate
        ])
        scores = jnp.asarray([0.9, 0.8, 0.7])
        keep, valid = ops.nms(boxes, scores, 0.5, 3)
        kept = set(np.asarray(keep)[np.asarray(valid)].tolist())
        assert kept == {0, 2}

    def test_batched_nms_keeps_cross_class(self):
        boxes = jnp.asarray([[0., 0., 10., 10.], [1., 1., 11., 11.]])
        scores = jnp.asarray([0.9, 0.8])
        cls = jnp.asarray([0, 1])
        keep, valid = ops.batched_nms(boxes, scores, cls, 0.5, 2)
        assert int(np.asarray(valid).sum()) == 2

    def test_ignores_neg_inf(self):
        boxes = jnp.asarray([[0., 0., 10., 10.], [20., 20., 30., 30.]])
        scores = jnp.asarray([0.9, -jnp.inf])
        keep, valid = ops.nms(boxes, scores, 0.5, 2)
        assert int(np.asarray(valid).sum()) == 1


class TestROIAlign:
    def test_constant_map(self):
        feat = jnp.ones((16, 16, 3)) * 5.0
        boxes = jnp.asarray([[2., 2., 10., 10.]])
        out = ops.roi_align(feat, boxes, out_size=4)
        np.testing.assert_allclose(out, 5.0, atol=1e-5)

    def test_gradient_map(self):
        """A linear ramp in x must pool to its bin-center averages."""
        W = 32
        xs = jnp.arange(W, dtype=jnp.float32)
        feat = jnp.tile(xs[None, :, None], (W, 1, 1))
        boxes = jnp.asarray([[4., 4., 28., 28.]])
        out = np.asarray(ops.roi_align(feat, boxes, out_size=6))[0]
        # each output column should equal the mean x position of its bin
        bin_w = 24.0 / 6
        expected = 4.0 + bin_w * (np.arange(6) + 0.5) - 0.5
        np.testing.assert_allclose(out[:, :, 0].mean(axis=0), expected,
                                   atol=0.1)


class TestMultilevelFlat:
    def test_flat_matches_per_level_select(self):
        """The single-gather multilevel pooler must reproduce the
        per-level pool + take_along_axis form exactly (round-4 rewrite
        — 4x less gather traffic, same values)."""
        from pvo_tpu.vps import roi_heads as rh

        rng = np.random.RandomState(0)
        feats = {}
        H0, W0 = 64, 96
        for lvl, stride in zip(rh.BOX_LEVELS, rh.BOX_STRIDES):
            h, w = H0 * 4 // stride, W0 * 4 // stride
            feats[lvl] = jnp.asarray(
                rng.randn(1, h, w, 8).astype(np.float32))
        # boxes spanning all assigned levels (sides 8..300 px)
        sides = rng.uniform(8, 300, (24, 2))
        cx = rng.uniform(0, 4 * W0, (24,))
        cy = rng.uniform(0, 4 * H0, (24,))
        boxes = jnp.asarray(np.stack(
            [cx - sides[:, 0] / 2, cy - sides[:, 1] / 2,
             cx + sides[:, 0] / 2, cy + sides[:, 1] / 2], axis=1
        ).astype(np.float32))

        got = rh.multilevel_roi_align(feats, boxes, out_size=7)

        lvl_idx = rh.assign_levels(boxes)
        pooled = []
        for lvl, stride in zip(rh.BOX_LEVELS, rh.BOX_STRIDES):
            pooled.append(ops.roi_align(
                feats[lvl][0], boxes, out_size=7,
                spatial_scale=1.0 / stride, samples=4))
        ref = jnp.take_along_axis(
            jnp.stack(pooled, 0),
            lvl_idx[None, :, None, None, None], axis=0)[0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)
