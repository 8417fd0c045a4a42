"""Sim(3) operations on 8-vectors ``[tx,ty,tz, qx,qy,qz,qw, s]``, pure JAX.

Layout matches reference lietorch (VO_Module/thirdparty/lietorch/lietorch/
include/sim3.h, rxso3.h): translation, scalar-last quaternion, scale.
Tangent layout ``[rho(3), phi(3), sigma(1)]``. Used by the geodesic training
loss (reference geom/losses.py:32-76) for scale-aware pose errors.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import so3

_EPS = 1e-6


def identity(shape=(), dtype=jnp.float32):
    g = jnp.zeros(shape + (8,), dtype)
    g = g.at[..., 6].set(1.0)
    return g.at[..., 7].set(1.0)


def from_se3(g_se3):
    """Embed SE3 7-vector as Sim3 with unit scale."""
    s = jnp.ones_like(g_se3[..., :1])
    return jnp.concatenate([g_se3, s], axis=-1)


def mul(g1, g2):
    t1, q1, s1 = g1[..., :3], g1[..., 3:7], g1[..., 7:8]
    t2, q2, s2 = g2[..., :3], g2[..., 3:7], g2[..., 7:8]
    q = so3.quat_mul(q1, q2)
    t = t1 + s1 * so3.quat_rotate(q1, t2)
    return jnp.concatenate([t, q, s1 * s2], axis=-1)


def inv(g):
    t, q, s = g[..., :3], g[..., 3:7], g[..., 7:8]
    qi = so3.quat_inv(q)
    si = 1.0 / s
    ti = -si * so3.quat_rotate(qi, t)
    return jnp.concatenate([ti, qi, si], axis=-1)


def act(g, p):
    t, q, s = g[..., :3], g[..., 3:7], g[..., 7:8]
    return s * so3.quat_rotate(q, p) + t


def act4(g, p):
    xyz, d = p[..., :3], p[..., 3:4]
    t, q, s = g[..., :3], g[..., 3:7], g[..., 7:8]
    out = s * so3.quat_rotate(q, xyz) + t * d
    return jnp.concatenate([out, d], axis=-1)


def _calcW(phi, sigma):
    """The W matrix of RxSO3/Sim3 exp (Sophus convention), (...,3,3)."""
    theta_sq = jnp.sum(phi * phi, axis=-1)
    small_t = theta_sq < _EPS
    theta = jnp.sqrt(jnp.where(small_t, jnp.ones_like(theta_sq), theta_sq))
    sig = sigma[..., 0]
    scale = jnp.exp(sig)

    small_s = jnp.abs(sig) < _EPS

    # coefficients A, B, C with W = A * Phi + B * Phi^2 + C * I
    C = jnp.where(small_s, 1.0 + sig / 2.0 + sig * sig / 6.0,
                  (scale - 1.0) / jnp.where(small_s, 1.0, sig))

    sig_safe = jnp.where(small_s, jnp.ones_like(sig), sig)
    th_safe = jnp.where(small_t, jnp.ones_like(theta), theta)

    # generic-case values
    a_gen = (sig_safe * jnp.sin(th_safe)
             + (1.0 - scale * jnp.cos(th_safe)) * th_safe) / \
        ((sig_safe * sig_safe + th_safe * th_safe) * th_safe)
    b_gen = (C - ((scale * jnp.cos(th_safe) - 1.0) * sig_safe
                  + scale * jnp.sin(th_safe) * th_safe) /
             (sig_safe * sig_safe + th_safe * th_safe)) / (th_safe * th_safe)

    # sigma ~ 0 limits
    a_s0 = jnp.where(small_t, 0.5 - theta_sq / 24.0,
                     (1.0 - jnp.cos(th_safe)) / (th_safe * th_safe))
    b_s0 = jnp.where(small_t, 1.0 / 6.0 - theta_sq / 120.0,
                     (th_safe - jnp.sin(th_safe)) / (th_safe ** 3))

    # theta ~ 0, sigma != 0 limits
    a_t0 = jnp.where(
        small_s, 0.5,
        ((sig_safe - 1.0) * scale + 1.0) / (sig_safe * sig_safe))
    b_t0 = jnp.where(
        small_s, 1.0 / 6.0,
        (scale * 0.5 * sig_safe * sig_safe + scale - 1.0
         - sig_safe * scale) / (sig_safe ** 3))

    A = jnp.where(small_s, a_s0, jnp.where(small_t, a_t0, a_gen))
    B = jnp.where(small_s, b_s0, jnp.where(small_t, b_t0, b_gen))

    Phi = so3.hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), Phi.shape)
    return (A[..., None, None] * Phi + B[..., None, None] * (Phi @ Phi)
            + C[..., None, None] * I)


def exp(tau):
    """Tangent [rho, phi, sigma] -> Sim3 8-vector."""
    rho, phi, sigma = tau[..., :3], tau[..., 3:6], tau[..., 6:7]
    q = so3.exp(phi)
    s = jnp.exp(sigma)
    W = _calcW(phi, sigma)
    t = jnp.einsum("...ij,...j->...i", W, rho)
    return jnp.concatenate([t, q, s], axis=-1)


def log(g):
    """Sim3 8-vector -> tangent [rho, phi, sigma]."""
    t, q, s = g[..., :3], g[..., 3:7], g[..., 7:8]
    phi = so3.log(q)
    sigma = jnp.log(jnp.maximum(s, 1e-24))
    W = _calcW(phi, sigma)
    rho = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma], axis=-1)
