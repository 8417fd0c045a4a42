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
