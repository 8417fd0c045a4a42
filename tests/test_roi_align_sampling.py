"""Quantify the ROIAlign sampling-grid delta (VERDICT #4).

The reference pools with torchvision ROIAlign(sampling_ratio=0): the
per-bin grid adapts to ceil(bin_size). Static shapes force us to fix
the grid; FPN level assignment (poolers.py canonical 224@lvl4) puts
level-assigned box bins in [2, 4) for the 7x7 box pooler and [1, 2)
for the 14x14 mask pooler, so multilevel_roi_align picks 4x4 resp.
2x2 — exact at the top of each range, an approximation below it.
These tests pin the exact-match cases and bound the rest.
"""

import numpy as np

import jax.numpy as jnp

from pvo_tpu.vps import ops


def roi_align_adaptive_np(feat, boxes, out_size, spatial_scale):
    """Numpy oracle of torchvision ROIAlign(aligned=True,
    sampling_ratio=0): per-bin grid = ceil(bin_h) x ceil(bin_w)."""
    H, W, C = feat.shape

    def bilinear(y, x):
        if y < -1.0 or y > H or x < -1.0 or x > W:
            return np.zeros(C, feat.dtype)
        y = min(max(y, 0.0), H - 1)
        x = min(max(x, 0.0), W - 1)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
        fy, fx = y - y0, x - x0
        return ((1 - fy) * (1 - fx) * feat[y0, x0] +
                (1 - fy) * fx * feat[y0, x1] +
                fy * (1 - fx) * feat[y1, x0] +
                fy * fx * feat[y1, x1])

    R = boxes.shape[0]
    out = np.zeros((R, out_size, out_size, C), feat.dtype)
    for r in range(R):
        x0, y0, x1, y1 = boxes[r] * spatial_scale
        x0, y0 = x0 - 0.5, y0 - 0.5
        x1, y1 = x1 - 0.5, y1 - 0.5
        bh = (y1 - y0) / out_size
        bw = (x1 - x0) / out_size
        gy = max(int(np.ceil(bh)), 1)
        gx = max(int(np.ceil(bw)), 1)
        for i in range(out_size):
            for j in range(out_size):
                acc = np.zeros(C, feat.dtype)
                for iy in range(gy):
                    for ix in range(gx):
                        y = y0 + (i + (iy + 0.5) / gy) * bh
                        x = x0 + (j + (ix + 0.5) / gx) * bw
                        acc += bilinear(y, x)
                out[r, i, j] = acc / (gy * gx)
    return out


def _boxes(rng, n, side_lo, side_hi, img_h, img_w):
    sides = rng.uniform(side_lo, side_hi, (n, 2))
    x0 = rng.uniform(1, img_w - sides[:, 0] - 1, (n,))
    y0 = rng.uniform(1, img_h - sides[:, 1] - 1, (n,))
    return np.stack([x0, y0, x0 + sides[:, 0], y0 + sides[:, 1]],
                    1).astype(np.float32)


def test_top_of_range_bins_match_adaptive_exactly():
    """bin in (3, 4] with samples=4 and bin in (1, 2] with samples=2:
    the static grid equals sampling_ratio=0's adaptive grid."""
    rng = np.random.RandomState(0)
    feat = rng.randn(40, 56, 8).astype(np.float32)
    stride = 8
    img_h, img_w = 40 * stride, 56 * stride

    # box pooler case: side/stride/7 in (3, 4] -> side in (168, 224]
    boxes = _boxes(rng, 6, 3.2 * 7 * stride, 4.0 * 7 * stride,
                   img_h, img_w)
    ref = roi_align_adaptive_np(feat, boxes, 7, 1.0 / stride)
    got = np.asarray(ops.roi_align(jnp.asarray(feat),
                                   jnp.asarray(boxes), out_size=7,
                                   spatial_scale=1.0 / stride,
                                   samples=4))
    np.testing.assert_allclose(got, ref, rtol=3e-5, atol=3e-5)

    # mask pooler case: side/stride/14 in (1, 2] -> samples=2 exact
    boxes = _boxes(rng, 6, 1.2 * 14 * stride, 2.0 * 14 * stride,
                   img_h, img_w)
    ref = roi_align_adaptive_np(feat, boxes, 14, 1.0 / stride)
    got = np.asarray(ops.roi_align(jnp.asarray(feat),
                                   jnp.asarray(boxes), out_size=14,
                                   spatial_scale=1.0 / stride,
                                   samples=2))
    np.testing.assert_allclose(got, ref, rtol=3e-5, atol=3e-5)


def test_lower_range_bins_bounded_on_smooth_features():
    """bin in [2, 3): adaptive 3x3 vs our 4x4 — both average the same
    bin; on band-limited features (what convnets output) the delta is
    a small fraction of the signal."""
    rng = np.random.RandomState(1)
    yy, xx = np.meshgrid(np.arange(40), np.arange(56), indexing="ij")
    feat = np.stack([np.sin(xx / 3.0 + p) * np.cos(yy / 4.0 - p)
                     for p in np.linspace(0, 2, 8)], -1)
    feat = feat.astype(np.float32)
    stride = 8
    img_h, img_w = 40 * stride, 56 * stride

    boxes = _boxes(rng, 8, 2.05 * 7 * stride, 2.9 * 7 * stride,
                   img_h, img_w)
    ref = roi_align_adaptive_np(feat, boxes, 7, 1.0 / stride)
    got = np.asarray(ops.roi_align(jnp.asarray(feat),
                                   jnp.asarray(boxes), out_size=7,
                                   spatial_scale=1.0 / stride,
                                   samples=4))
    err = np.abs(got - ref).max()
    scale = np.abs(ref).mean()
    assert err / scale < 0.05, (err, scale)
