"""Unit tests (vs small numpy oracles) for the reference-parity
features added in round 2: unsup_dy_vals, pose_transport_depth, and
the bit-compat flow-resize quirk flag."""

import numpy as np

import jax.numpy as jnp

from pvo_tpu.vo import losses
from pvo_tpu.vps.panoptic_fpn import (_bitcompat_uint16,
                                      flow_warp_features,
                                      pose_transport_depth)


# ------------------------------------------------------- unsup_dy_vals

def test_unsup_dy_vals_tensor_masks():
    """GT-tensor form (reference losses.py:325-333): full-res per-frame
    masks subsampled 3::8 and gathered at edge sources."""
    rng = np.random.RandomState(0)
    B, F, N, H, W = 1, 3, 4, 6, 8
    vals = rng.rand(B, N, H, W).astype(np.float32)
    gt = (rng.rand(B, F, 8 * H, 8 * W) > 0.5).astype(np.float32)
    ii = np.array([0, 1, 2, 1])

    out = np.asarray(losses.unsup_dy_vals(
        jnp.asarray(vals), jnp.asarray(gt), ii))

    dy = gt[:, :, 3::8, 3::8][:, ii]
    expect = np.clip(vals + (1.0 - dy), 0.0, 1.0)
    np.testing.assert_allclose(out, expect, rtol=1e-6)
    # semantics: static pixels (mask 0) forced valid, dynamic keep val
    assert np.all(out[dy == 0] == 1.0)
    np.testing.assert_allclose(out[dy == 1], vals[dy == 1], rtol=1e-6)


def test_unsup_dy_vals_list_masks():
    """Per-step self-label list form (losses.py:335-345)."""
    rng = np.random.RandomState(1)
    B, N, H, W = 1, 2, 4, 5
    vlist = [rng.rand(B, N, H, W).astype(np.float32) for _ in range(3)]
    dlist = [(rng.rand(B, N, H, W) > 0.5).astype(np.float32)
             for _ in range(3)]
    outs = losses.unsup_dy_vals(
        [jnp.asarray(v) for v in vlist],
        [jnp.asarray(d) for d in dlist], np.array([0, 1]))
    assert len(outs) == 3
    for o, v, d in zip(outs, vlist, dlist):
        np.testing.assert_allclose(
            np.asarray(o), np.clip(v + (1 - d), 0, 1), rtol=1e-6)


# ------------------------------------------------ pose_transport_depth

def test_pose_transport_depth_vs_numpy_oracle():
    """Mirror of reference panoptic_fpn.py:388-408."""
    rng = np.random.RandomState(2)
    H, W = 5, 7
    fx, fy, cx, cy = 50.0, 55.0, W / 2.0, H / 2.0
    depth = (1.0 + rng.rand(H, W)).astype(np.float32)

    def rand_w2c(seed):
        r = np.random.RandomState(seed)
        aa = 0.1 * r.randn(3)
        th = np.linalg.norm(aa)
        k = aa / max(th, 1e-9)
        K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]],
                      [-k[1], k[0], 0]])
        R = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = 0.3 * r.randn(3)
        return T.astype(np.float32)

    E0, E1 = rand_w2c(3), rand_w2c(4)

    out = np.asarray(pose_transport_depth(
        jnp.asarray(depth), jnp.asarray(E0), jnp.asarray(E1),
        (fx, fy, cx, cy)))

    # oracle: reference's numpy math verbatim
    v = np.repeat(np.arange(H).reshape(H, 1), W, axis=1)
    u = np.tile(np.arange(W), (H, 1))
    Z = depth
    X = (u - cx) / fx * Z
    Y = (v - cy) / fy * Z
    pts = np.array([X, Y, Z, np.ones((H, W))]).reshape(4, -1)
    rel = E1 @ np.linalg.inv(E0)
    expect = (rel @ pts)[2].reshape(H, W)
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)


def test_pose_transport_depth_identity():
    depth = np.full((4, 6), 2.5, np.float32)
    E = np.eye(4, dtype=np.float32)
    out = np.asarray(pose_transport_depth(
        jnp.asarray(depth), jnp.asarray(E), jnp.asarray(E),
        (10.0, 10.0, 3.0, 2.0)))
    np.testing.assert_allclose(out, depth, rtol=1e-6)


# -------------------------------------------------- bitcompat flow

def test_bitcompat_uint16_matches_numpy_cast():
    vals = np.array([0.0, 0.4, 1.9, 7.0, -0.3, -1.7, -100.2, 300.9],
                    np.float32)
    ours = np.asarray(_bitcompat_uint16(jnp.asarray(vals)))
    with np.errstate(invalid="ignore"):
        expect = vals.astype(np.uint16).astype(np.float32)
    np.testing.assert_array_equal(ours, expect)


def test_flow_warp_bitcompat_drops_negative_flow():
    """In bitcompat mode a negative flow wraps out of bounds and the
    pixel transports nothing (reference panoptic_fpn.py:313-330);
    corrected mode splats it normally."""
    h, w, C = 8, 8, 3
    rng = np.random.RandomState(5)
    feat = rng.rand(1, h, w, C).astype(np.float32)
    flow = np.zeros((h, w, 2), np.float32)
    flow[:, :, 0] = -2.0  # uniform negative x-flow

    out_fix = flow_warp_features({"p2": jnp.asarray(feat)},
                                 jnp.asarray(flow))["p2"]
    out_bc = flow_warp_features({"p2": jnp.asarray(feat)},
                                jnp.asarray(flow),
                                bitcompat=True)["p2"]
    # corrected: columns shift left by 2
    np.testing.assert_allclose(
        np.asarray(out_fix)[0, :, : w - 2], feat[0, :, 2:], rtol=1e-5)
    # bitcompat: everything wrapped out of bounds -> zeros
    np.testing.assert_array_equal(np.asarray(out_bc),
                                  np.zeros_like(feat))


def test_flow_warp_bitcompat_positive_flow_unscaled():
    """Positive integer flow in bitcompat mode is applied in FULL-RES
    pixel units at every level (no rescale)."""
    H, W, C = 8, 8, 2
    rng = np.random.RandomState(6)
    feat = rng.rand(1, H // 2, W // 2, C).astype(np.float32)  # level/2
    flow = np.zeros((H, W, 2), np.float32)
    flow[:, :, 1] = 1.0  # +1 full-res row

    out_bc = np.asarray(flow_warp_features(
        {"p3": jnp.asarray(feat)}, jnp.asarray(flow),
        bitcompat=True)["p3"])
    # at the half-res level the reference still adds +1 (quirk), not 0.5
    np.testing.assert_allclose(out_bc[0, 1:], feat[0, :-1], rtol=1e-5)
    np.testing.assert_array_equal(out_bc[0, 0],
                                  np.zeros_like(out_bc[0, 0]))


def test_ssim_loss_matches_reference_torch():
    """ssim_loss == the reference SSIM module (losses.py:365-398)
    re-derived in torch: 3x3 AvgPool with reflection padding and the
    [0,1] CLAMP on (1-s)/2. The round-5 recipe run surfaced the bug
    this pins: a gaussian-window unclamped variant drove cam_ph
    negative on low-variance synthetic frames."""
    import jax.numpy as jnp
    import torch
    import torch.nn as tnn

    from pvo_tpu.vo.losses import ssim_loss

    class RefSSIM(tnn.Module):
        def __init__(self):
            super().__init__()
            self.p = tnn.AvgPool2d(3, 1)
            self.r = tnn.ReflectionPad2d(1)

        def forward(self, x, y):
            x, y = self.r(x), self.r(y)
            mx, my = self.p(x), self.p(y)
            sx = self.p(x ** 2) - mx ** 2
            sy = self.p(y ** 2) - my ** 2
            sxy = self.p(x * y) - mx * my
            n = (2 * mx * my + 0.01 ** 2) * (2 * sxy + 0.03 ** 2)
            d = (mx ** 2 + my ** 2 + 0.01 ** 2) * (sx + sy + 0.03 ** 2)
            return torch.clamp((1 - n / d) / 2, 0, 1)

    rng = np.random.RandomState(0)
    x = rng.rand(2, 16, 20, 3).astype(np.float32)
    y = (x + 0.1 * rng.randn(2, 16, 20, 3)).astype(np.float32)
    ref = RefSSIM()(torch.tensor(x).permute(0, 3, 1, 2),
                    torch.tensor(y).permute(0, 3, 1, 2)) \
        .permute(0, 2, 3, 1).numpy()
    got = np.asarray(ssim_loss(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, ref, atol=1e-5)

    # flat frames must cost exactly 0 (the clamp's job)
    flat = jnp.full((1, 8, 8, 3), 0.5)
    assert float(np.abs(np.asarray(ssim_loss(flat, flat))).max()) == 0.0
