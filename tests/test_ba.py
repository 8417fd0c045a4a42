"""Tests for the differentiable bundle adjustment (training path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvo_tpu.geom import projective
from pvo_tpu.geom.ba import bundle_adjust, motion_only_ba
from pvo_tpu.geom.chol import schur_solve, solve_psd
from pvo_tpu.lie import se3

B, P, H, W = 1, 4, 8, 10


def make_scene(key, noise=0.02, dtype=jnp.float64):
    ks = jax.random.split(key, 4)
    # ground-truth: smooth forward motion with noise
    base = jnp.array([0.1, 0.0, 0.02, 0.0, 0.01, 0.0], dtype=dtype)
    tangents = base * jnp.arange(P, dtype=dtype)[:, None] + \
        0.01 * jax.random.normal(ks[0], (P, 6), dtype=dtype)
    poses_gt = se3.exp(tangents)[None]
    disps_gt = 0.7 + 0.2 * jax.random.uniform(ks[1], (B, P, H, W),
                                              dtype=dtype)
    intr = jnp.broadcast_to(
        jnp.array([12.0, 12.0, W / 2.0, H / 2.0], dtype=dtype), (B, P, 4))

    # perturbed initialization (first two poses fixed at GT)
    dp = noise * jax.random.normal(ks[2], (P, 6), dtype=dtype)
    dp = dp.at[:2].set(0.0)
    poses0 = se3.mul(se3.exp(dp)[None], poses_gt)
    disps0 = disps_gt + noise * jax.random.normal(
        ks[3], disps_gt.shape, dtype=dtype)
    return poses_gt, disps_gt, poses0, disps0, intr


def graph_all_pairs():
    ii, jj = np.meshgrid(np.arange(P), np.arange(P), indexing="ij")
    keep = (ii != jj) & (np.abs(ii - jj) <= 2)
    return ii[keep], jj[keep]


class TestBundleAdjust:
    @pytest.mark.slow
    def test_reduces_reprojection_error(self):
        poses_gt, disps_gt, poses, disps, intr = make_scene(
            jax.random.PRNGKey(3))
        ii, jj = graph_all_pairs()

        target, _ = projective.projective_transform(
            poses_gt, disps_gt, intr, ii, jj)
        weight = jnp.ones_like(target)
        eta = 1e-4 * jnp.ones((B, len(np.unique(ii)), H, W),
                              dtype=jnp.float64)

        def resid(p, d):
            c, v = projective.projective_transform(p, d, intr, ii, jj)
            return jnp.sqrt(jnp.mean(v * (target - c) ** 2))

        e0 = resid(poses, disps)
        for _ in range(6):
            poses, disps = bundle_adjust(
                target, weight, eta, poses, disps, intr, ii, jj, fixedp=2)
        e1 = resid(poses, disps)
        assert float(e1) < 0.2 * float(e0), (float(e0), float(e1))

    def test_fixed_poses_unchanged(self):
        _, _, poses, disps, intr = make_scene(jax.random.PRNGKey(4))
        ii, jj = graph_all_pairs()
        target, _ = projective.projective_transform(
            poses, disps, intr, ii, jj)
        target = target + 0.5  # force an update
        weight = jnp.ones_like(target)
        eta = 1e-4 * jnp.ones((B, len(np.unique(ii)), H, W),
                              dtype=jnp.float64)
        p1, _ = bundle_adjust(target, weight, eta, poses, disps, intr,
                              ii, jj, fixedp=2)
        np.testing.assert_allclose(p1[:, :2], poses[:, :2], atol=1e-12)
        assert float(jnp.abs(p1[:, 2:] - poses[:, 2:]).max()) > 1e-8

    def test_motion_only_ba(self):
        poses_gt, disps_gt, poses, _, intr = make_scene(
            jax.random.PRNGKey(5))
        ii, jj = graph_all_pairs()
        target, _ = projective.projective_transform(
            poses_gt, disps_gt, intr, ii, jj)
        weight = jnp.ones_like(target)

        def pose_err(p):
            return float(jnp.abs(se3.log(
                se3.mul(se3.inv(p), poses_gt))).max())

        e0 = pose_err(poses)
        for _ in range(6):
            poses = motion_only_ba(target, weight, None, poses, disps_gt,
                                   intr, ii, jj, fixedp=2)
        assert pose_err(poses) < 0.3 * e0

    @pytest.mark.slow
    def test_gradients_flow(self):
        """The BA step must be differentiable w.r.t. target/weight —
        the property the whole training pipeline depends on."""
        poses_gt, disps_gt, poses, disps, intr = make_scene(
            jax.random.PRNGKey(6))
        ii, jj = graph_all_pairs()
        target, _ = projective.projective_transform(
            poses_gt, disps_gt, intr, ii, jj)
        eta = 1e-4 * jnp.ones((B, len(np.unique(ii)), H, W),
                              dtype=jnp.float64)

        def loss(t, w):
            p, d = bundle_adjust(t, w, eta, poses, disps, intr, ii, jj)
            return jnp.sum((p - poses_gt) ** 2) + 1e-3 * jnp.sum(d ** 2)

        g_t, g_w = jax.grad(loss, argnums=(0, 1))(
            target, jnp.ones_like(target))
        assert bool(jnp.all(jnp.isfinite(g_t)))
        assert bool(jnp.all(jnp.isfinite(g_w)))
        assert float(jnp.abs(g_t).max()) > 0


class TestSolvers:
    def test_solve_psd_matches_linalg(self):
        key = jax.random.PRNGKey(0)
        A = jax.random.normal(key, (2, 5, 5), dtype=jnp.float64)
        H = A @ jnp.swapaxes(A, -1, -2) + 5 * jnp.eye(5)
        b = jax.random.normal(key, (2, 5, 1), dtype=jnp.float64)
        np.testing.assert_allclose(
            solve_psd(H, b), jnp.linalg.solve(H, b), atol=1e-9)

    def test_solve_psd_failure_returns_zero(self):
        H = -jnp.eye(3, dtype=jnp.float64)[None]  # not PSD
        b = jnp.ones((1, 3, 1), dtype=jnp.float64)
        np.testing.assert_allclose(solve_psd(H, b), 0.0)

    @pytest.mark.slow
    def test_schur_matches_full_solve(self):
        """Schur-eliminated solve == direct solve of the full KKT system."""
        key = jax.random.PRNGKey(7)
        Bb, Pp, Mm, D, HW = 1, 2, 2, 3, 4
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        A = jax.random.normal(k1, (Bb, Pp * D, Pp * D), dtype=jnp.float64)
        H = A @ jnp.swapaxes(A, -1, -2) + 10 * jnp.eye(Pp * D)
        E = 0.3 * jax.random.normal(k2, (Bb, Pp * D, Mm * HW),
                                    dtype=jnp.float64)
        C = 2.0 + jax.random.uniform(k3, (Bb, Mm, HW), dtype=jnp.float64)
        v = jax.random.normal(k4, (Bb, Pp, D), dtype=jnp.float64)
        w = jax.random.normal(k5, (Bb, Mm, HW), dtype=jnp.float64)

        # full system [[H, E], [E^T, diag(C)]] [dx, dz] = [v, w]
        # (undo the ep/lm damping by passing it into the full matrix too)
        ep, lm = 0.1, 1e-4
        Hd = H + (ep + lm * H) * jnp.eye(Pp * D)
        Cd = C.reshape(Bb, -1)
        full = jnp.zeros((Bb, Pp * D + Mm * HW, Pp * D + Mm * HW),
                         dtype=jnp.float64)
        full = full.at[:, :Pp * D, :Pp * D].set(Hd)
        full = full.at[:, :Pp * D, Pp * D:].set(E)
        full = full.at[:, Pp * D:, :Pp * D].set(jnp.swapaxes(E, -1, -2))
        full = full.at[:, Pp * D:, Pp * D:].set(
            jnp.eye(Mm * HW) * Cd[:, None, :])
        rhs = jnp.concatenate([v.reshape(Bb, -1), w.reshape(Bb, -1)], -1)
        sol = jnp.linalg.solve(full, rhs[..., None])[..., 0]

        H5 = jnp.transpose(H.reshape(Bb, Pp, D, Pp, D), (0, 1, 3, 2, 4))
        E5 = jnp.transpose(E.reshape(Bb, Pp, D, Mm, HW), (0, 1, 3, 2, 4))
        dx, dz = schur_solve(H5, E5, C, v, w, ep=ep, lm=lm)
        np.testing.assert_allclose(dx.reshape(Bb, -1),
                                   sol[:, :Pp * D], atol=1e-8)
        np.testing.assert_allclose(dz.reshape(Bb, -1),
                                   sol[:, Pp * D:], atol=1e-8)


class TestDepthOnlyFastPath:
    """fixedp == P (all poses fixed) routes to the depth-only fast
    path (geom/ba.py _depth_only_step) — the test_vo2 export case
    (reference evaluation_scripts/test_vo2.py: 2-frame window, GT
    poses). Parity oracle: the dense per-pixel GN depth step built
    from the INDEPENDENT stacked-layout jacobians."""

    def _scene(self):
        poses_gt, disps_gt, poses, disps, intr = make_scene(
            jax.random.PRNGKey(11))
        ii, jj = graph_all_pairs()
        target, _ = projective.projective_transform(
            poses_gt, disps_gt, intr, ii, jj)
        target = target + 0.3
        weight = 0.5 + 0.5 * jax.random.uniform(
            jax.random.PRNGKey(12), target.shape, dtype=target.dtype)
        eta = 1e-4 * jnp.ones((B, len(np.unique(ii)), H, W),
                              dtype=jnp.float64)
        return target, weight, eta, poses, disps, intr, ii, jj

    def test_matches_dense_depth_step(self):
        target, weight, eta, poses, disps, intr, ii, jj = self._scene()

        p1, d1 = bundle_adjust(target, weight, eta, poses, disps, intr,
                               ii, jj, fixedp=P)
        np.testing.assert_allclose(p1, poses, atol=0)  # poses untouched

        # oracle from the stacked jacobian layout
        coords, valid, (Ji, Jj_, Jz) = projective.projective_transform(
            poses, disps, intr, ii, jj, jacobian=True)
        r = (target - coords)                       # (B,N,H,W,2)
        w = 0.001 * valid * weight
        Jz2 = Jz[..., 0]                            # (B,N,H,W,2)
        Ck = jnp.sum(w * Jz2 * Jz2, axis=-1)        # (B,N,H,W)
        wk = jnp.sum(w * r * Jz2, axis=-1)
        kx, kk = np.unique(np.asarray(ii), return_inverse=True)
        Mn = len(kx)
        Cs = jnp.zeros((B, Mn, H, W), Ck.dtype)
        ws = jnp.zeros((B, Mn, H, W), wk.dtype)
        for e, k in enumerate(kk):
            Cs = Cs.at[:, k].add(Ck[:, e])
            ws = ws.at[:, k].add(wk[:, e])
        dz = ws / (Cs + eta + 1e-7)
        d_exp = disps
        for m, k in enumerate(kx):
            d_exp = d_exp.at[:, k].add(dz[:, m])
        d_exp = jnp.where(d_exp > 10.0, 0.0, jnp.maximum(d_exp, 0.0))
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d_exp),
                                   atol=1e-9)

    def test_two_frame_vo2_geometry(self):
        """The exact vo2 shape: P_all=2, fixedp=2, edges (0,1),(1,0)."""
        _, _, poses, disps, intr = make_scene(jax.random.PRNGKey(13))
        poses, disps, intr = poses[:, :2], disps[:, :2], intr[:, :2]
        ii = np.array([0, 1])
        jj = np.array([1, 0])
        target, _ = projective.projective_transform(
            poses, disps, intr, ii, jj)
        target = target + 0.2
        weight = jnp.ones_like(target)
        eta = 1e-4 * jnp.ones((B, 2, H, W), dtype=jnp.float64)
        p1, d1 = bundle_adjust(target, weight, eta, poses, disps, intr,
                               ii, jj, fixedp=2)
        np.testing.assert_allclose(p1, poses, atol=0)
        assert bool(jnp.all(jnp.isfinite(d1)))
        assert float(jnp.abs(d1 - disps).max()) > 1e-8

    def test_grads_flow_depth_only(self):
        target, weight, eta, poses, disps, intr, ii, jj = self._scene()

        def loss(t, w):
            _, d = bundle_adjust(t, w, eta, poses, disps, intr, ii, jj,
                                 fixedp=P)
            return 1e-3 * jnp.sum(d ** 2)

        g_t, g_w = jax.grad(loss, argnums=(0, 1))(target, weight)
        assert bool(jnp.all(jnp.isfinite(g_t)))
        assert bool(jnp.all(jnp.isfinite(g_w)))
        assert float(jnp.abs(g_t).max()) > 0
