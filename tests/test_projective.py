"""Tests for projective geometry: analytic jacobians vs autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvo_tpu.geom import projective
from pvo_tpu.lie import se3

B, P, H, W = 1, 3, 6, 8


def make_problem(key, dtype=jnp.float64):
    k1, k2 = jax.random.split(key)
    tangents = 0.1 * jax.random.normal(k1, (B, P, 6), dtype=dtype)
    poses = se3.exp(tangents)
    disps = 0.5 + 0.3 * jax.random.uniform(k2, (B, P, H, W), dtype=dtype)
    intr = jnp.broadcast_to(
        jnp.array([8.0, 8.0, W / 2.0, H / 2.0], dtype=dtype), (B, P, 4))
    return poses, disps, intr


class TestProjectiveTransform:
    def setup_method(self, _):
        self.poses, self.disps, self.intr = make_problem(jax.random.PRNGKey(1))
        self.ii = np.array([0, 1])
        self.jj = np.array([1, 2])

    def test_identity_transform_is_grid(self):
        poses = jnp.broadcast_to(se3.identity(dtype=jnp.float64), (B, P, 7))
        coords, valid = projective.projective_transform(
            poses, self.disps, self.intr, self.ii, self.jj)
        grid = projective.coords_grid(H, W, dtype=jnp.float64)
        np.testing.assert_allclose(coords, jnp.broadcast_to(
            grid, coords.shape), atol=1e-10)
        np.testing.assert_allclose(valid, 1.0)

    @pytest.mark.slow
    def test_jacobian_pose_j(self):
        coords, _, (Ji, Jj, Jz) = projective.projective_transform(
            self.poses, self.disps, self.intr, self.ii, self.jj,
            jacobian=True)

        def f(eps):
            poses = self.poses.at[:, 2].set(
                se3.retr(self.poses[:, 2], eps))
            c, _ = projective.projective_transform(
                poses, self.disps, self.intr, self.ii, self.jj)
            return c[:, 1]  # edge 1 -> 2: depends on pose 2 as jj

        J_auto = jax.jacobian(f)(jnp.zeros(6, dtype=jnp.float64))
        # J_auto: (B,H,W,2,6); matches Jj of edge index 1
        np.testing.assert_allclose(J_auto, Jj[:, 1], atol=1e-7)

    def test_jacobian_pose_i(self):
        _, _, (Ji, Jj, Jz) = projective.projective_transform(
            self.poses, self.disps, self.intr, self.ii, self.jj,
            jacobian=True)

        def f(eps):
            poses = self.poses.at[:, 1].set(
                se3.retr(self.poses[:, 1], eps))
            c, _ = projective.projective_transform(
                poses, self.disps, self.intr, self.ii, self.jj)
            return c[:, 1]  # edge 1 -> 2: depends on pose 1 as ii

        J_auto = jax.jacobian(f)(jnp.zeros(6, dtype=jnp.float64))
        np.testing.assert_allclose(J_auto, Ji[:, 1], atol=1e-7)

    def test_jacobian_depth(self):
        _, _, (Ji, Jj, Jz) = projective.projective_transform(
            self.poses, self.disps, self.intr, self.ii, self.jj,
            jacobian=True)

        def f(d):
            disps = self.disps.at[:, 0].set(d)
            c, _ = projective.projective_transform(
                poses=self.poses, disps=disps, intrinsics=self.intr,
                ii=self.ii, jj=self.jj)
            return c[:, 0]  # edge 0 -> 1 uses depth of frame 0

        J_auto = jax.jacobian(f)(self.disps[0, 0])
        # diagonal of J_auto over pixels == Jz
        J_diag = jnp.stack(
            [J_auto[0, :, :, c, :, :].reshape(H * W, H * W).diagonal()
             for c in range(2)], -1).reshape(H, W, 2)
        np.testing.assert_allclose(J_diag, Jz[0, 0, ..., 0], atol=1e-7)

    def test_induced_flow_zero_motion(self):
        poses = jnp.broadcast_to(se3.identity(dtype=jnp.float64), (B, P, 7))
        flow, valid = projective.induced_flow(
            poses, self.disps, self.intr, self.ii, self.jj)
        np.testing.assert_allclose(flow, 0.0, atol=1e-10)


def test_window_distance_matrix_matches_flat_pairs():
    """The pair-matrix restructuring of window_distance_matrix (X0
    computed once per frame, broadcast over pairs) must match
    frame_distance on the flat WD*WD pair list exactly."""
    import jax.numpy as jnp
    import numpy as np

    from pvo_tpu.geom.distance import (frame_distance,
                                       window_distance_matrix)

    rng = np.random.RandomState(3)
    F, h, w = 10, 6, 12
    poses = np.concatenate(
        [0.1 * rng.randn(F, 3), rng.randn(F, 4)], 1).astype(np.float32)
    poses[:, 3:] /= np.linalg.norm(poses[:, 3:], axis=1, keepdims=True)
    disps = (0.5 + rng.rand(F, h, w)).astype(np.float32)
    intr = np.array([15.0, 15.0, 6.0, 3.0], np.float32)
    WD, d0 = 6, 2
    ii, jj = np.meshgrid(np.arange(WD), np.arange(WD), indexing="ij")
    ref = frame_distance(
        jnp.asarray(poses[d0:d0 + WD]), jnp.asarray(disps[d0:d0 + WD]),
        jnp.asarray(intr), ii.reshape(-1), jj.reshape(-1),
        0.6).reshape(WD, WD)
    ref = 0.5 * (ref + ref.T)
    got = window_distance_matrix(
        jnp.asarray(poses), jnp.asarray(disps), jnp.asarray(intr),
        d0, WD, 0.6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5)
