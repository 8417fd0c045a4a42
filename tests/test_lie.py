"""Property tests for the Lie group library.

Modeled on the reference's lietorch self-tests
(VO_Module/thirdparty/lietorch/lietorch/run_tests.py): exp/log roundtrip,
group axioms, adjoint identities, and analytic-vs-autodiff jacobians.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvo_tpu.lie import se3, sim3, so3

KEY = jax.random.PRNGKey(0)


def rand_tangent(key, dim, n=32, sigma=1.0):
    return sigma * jax.random.normal(key, (n, dim), dtype=jnp.float64)


class TestSO3:
    def test_exp_log_roundtrip(self):
        phi = rand_tangent(KEY, 3)
        phi2 = so3.log(so3.exp(phi))
        np.testing.assert_allclose(phi, phi2, atol=1e-9)

    def test_exp_log_small_angle(self):
        phi = rand_tangent(KEY, 3, sigma=1e-8)
        np.testing.assert_allclose(phi, so3.log(so3.exp(phi)), atol=1e-12)

    def test_mul_inv(self):
        q = so3.exp(rand_tangent(KEY, 3))
        e = so3.quat_mul(q, so3.quat_inv(q))
        np.testing.assert_allclose(e[..., 3], 1.0, atol=1e-9)
        np.testing.assert_allclose(e[..., :3], 0.0, atol=1e-9)

    def test_rotate_matches_matrix(self):
        k1, k2 = jax.random.split(KEY)
        q = so3.exp(rand_tangent(k1, 3))
        p = rand_tangent(k2, 3)
        r1 = so3.quat_rotate(q, p)
        r2 = jnp.einsum("nij,nj->ni", so3.quat_to_matrix(q), p)
        np.testing.assert_allclose(r1, r2, atol=1e-9)

    def test_matrix_roundtrip(self):
        q = so3.exp(rand_tangent(KEY, 3))
        q2 = so3.quat_from_matrix(so3.quat_to_matrix(q))
        # q and -q are the same rotation
        sign = jnp.sign(jnp.sum(q * q2, axis=-1, keepdims=True))
        np.testing.assert_allclose(q, sign * q2, atol=1e-8)

    def test_left_jacobian_inverse(self):
        phi = rand_tangent(KEY, 3)
        J = so3.left_jacobian(phi)
        Jinv = so3.left_jacobian_inverse(phi)
        I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), J.shape)
        np.testing.assert_allclose(J @ Jinv, I, atol=1e-9)


class TestSE3:
    def test_exp_log_roundtrip(self):
        x = rand_tangent(KEY, 6)
        np.testing.assert_allclose(x, se3.log(se3.exp(x)), atol=1e-9)

    def test_identity_and_inverse(self):
        g = se3.exp(rand_tangent(KEY, 6))
        e = se3.mul(g, se3.inv(g))
        np.testing.assert_allclose(e[..., :3], 0.0, atol=1e-9)
        np.testing.assert_allclose(jnp.abs(e[..., 6]), 1.0, atol=1e-9)

    def test_associativity_on_points(self):
        k1, k2, k3 = jax.random.split(KEY, 3)
        g1 = se3.exp(rand_tangent(k1, 6))
        g2 = se3.exp(rand_tangent(k2, 6))
        p = rand_tangent(k3, 3)
        r1 = se3.act(se3.mul(g1, g2), p)
        r2 = se3.act(g1, se3.act(g2, p))
        np.testing.assert_allclose(r1, r2, atol=1e-9)

    def test_adjoint_identity(self):
        """X * exp(a) == exp(Adj_X a) * X."""
        k1, k2 = jax.random.split(KEY)
        g = se3.exp(rand_tangent(k1, 6))
        a = rand_tangent(k2, 6, sigma=0.1)
        lhs = se3.mul(g, se3.exp(a))
        rhs = se3.mul(se3.exp(se3.adj(g, a)), g)
        np.testing.assert_allclose(se3.act(lhs, jnp.ones(3)),
                                   se3.act(rhs, jnp.ones(3)), atol=1e-8)

    def test_adjT_is_transpose(self):
        k1, k2 = jax.random.split(KEY)
        g = se3.exp(rand_tangent(k1, 6))
        a = rand_tangent(k2, 6)
        r1 = se3.adjT(g, a)
        r2 = jnp.einsum("nji,nj->ni", se3.adj_matrix(g), a)
        np.testing.assert_allclose(r1, r2, atol=1e-10)

    def test_matrix_consistency(self):
        k1, k2 = jax.random.split(KEY)
        g = se3.exp(rand_tangent(k1, 6))
        p = rand_tangent(k2, 3)
        ph = jnp.concatenate([p, jnp.ones_like(p[..., :1])], -1)
        r1 = se3.act(g, p)
        r2 = jnp.einsum("nij,nj->ni", se3.matrix(g), ph)[..., :3]
        np.testing.assert_allclose(r1, r2, atol=1e-9)

    def test_from_matrix_roundtrip(self):
        g = se3.exp(rand_tangent(KEY, 6))
        g2 = se3.from_matrix(se3.matrix(g))
        sign = jnp.sign(jnp.sum(g[..., 3:] * g2[..., 3:], -1, keepdims=True))
        np.testing.assert_allclose(g[..., :3], g2[..., :3], atol=1e-8)
        np.testing.assert_allclose(g[..., 3:], sign * g2[..., 3:], atol=1e-8)

    def test_retr_matches_definition(self):
        k1, k2 = jax.random.split(KEY)
        g = se3.exp(rand_tangent(k1, 6))
        dx = rand_tangent(k2, 6, sigma=0.01)
        r1 = se3.retr(g, dx)
        r2 = se3.mul(se3.exp(dx), g)
        np.testing.assert_allclose(r1, r2, atol=1e-12)

    @pytest.mark.slow
    def test_exp_jacobian_vs_autodiff(self):
        """d/d(eps) [exp(eps) * g] . p at eps=0 — the BA linearization —
        must equal the analytic point-action jacobian [I, -[Gp]x+...]."""
        k1, k2 = jax.random.split(KEY)
        g = se3.exp(rand_tangent(k1, 6, n=1))[0]
        p = rand_tangent(k2, 3, n=1)[0]

        def f(eps):
            return se3.act(se3.retr(g, eps), p)

        J_auto = jax.jacobian(f)(jnp.zeros(6, dtype=jnp.float64))
        gp = se3.act(g, p)
        X, Y, Z = gp
        # analytic: translation part I, rotation part -hat(gp)
        J_analytic = jnp.concatenate(
            [jnp.eye(3), -so3.hat(jnp.array([X, Y, Z]))], axis=1)
        np.testing.assert_allclose(J_auto, J_analytic, atol=1e-8)


class TestSim3:
    def test_exp_log_roundtrip(self):
        tau = rand_tangent(KEY, 7, sigma=0.5)
        np.testing.assert_allclose(tau, sim3.log(sim3.exp(tau)), atol=1e-8)

    def test_small_angle_roundtrip(self):
        tau = rand_tangent(KEY, 7, sigma=1e-7)
        np.testing.assert_allclose(tau, sim3.log(sim3.exp(tau)), atol=1e-10)

    def test_mul_inv(self):
        g = sim3.exp(rand_tangent(KEY, 7, sigma=0.5))
        e = sim3.mul(g, sim3.inv(g))
        np.testing.assert_allclose(e[..., :3], 0.0, atol=1e-8)
        np.testing.assert_allclose(e[..., 7], 1.0, atol=1e-8)

    def test_se3_embedding(self):
        k1, k2 = jax.random.split(KEY)
        g = se3.exp(rand_tangent(k1, 6))
        p = rand_tangent(k2, 3)
        r1 = se3.act(g, p)
        r2 = sim3.act(sim3.from_se3(g), p)
        np.testing.assert_allclose(r1, r2, atol=1e-10)

    def test_scale_action(self):
        g = sim3.identity((1,), dtype=jnp.float64).at[..., 7].set(2.0)
        p = jnp.ones((1, 3), dtype=jnp.float64)
        np.testing.assert_allclose(sim3.act(g, p), 2.0 * p)


class TestJitAndVmap:
    def test_all_ops_jit(self):
        g = se3.exp(rand_tangent(KEY, 6))
        for fn in [se3.log, se3.inv, se3.adj_matrix, se3.matrix]:
            np.testing.assert_allclose(jax.jit(fn)(g), fn(g), atol=1e-12)

    def test_grad_through_exp_at_zero(self):
        """Gradients at the singular point must be finite."""
        def loss(x):
            return jnp.sum(se3.act(se3.exp(x), jnp.ones(3)) ** 2)
        gr = jax.grad(loss)(jnp.zeros(6, dtype=jnp.float64))
        assert bool(jnp.all(jnp.isfinite(gr)))
