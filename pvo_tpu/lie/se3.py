"""SE(3) operations on 7-vectors ``[tx,ty,tz, qx,qy,qz,qw]``, pure JAX.

Data layout matches the reference lietorch embedding (translation first,
scalar-last quaternion; reference: VO_Module/thirdparty/lietorch/lietorch/
include/se3.h). Tangent layout is ``[rho(3), phi(3)]`` (translation part
first), matching the Jacobian column ordering used by the reference BA
(VO_Module/droid_slam/geom/projective_ops.py:72-99).

All ops broadcast over leading dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import so3

_EPS = 1e-6


def identity(shape=(), dtype=jnp.float32):
    g = jnp.zeros(shape + (7,), dtype)
    return g.at[..., 6].set(1.0)


def mul(g1, g2):
    """Group composition g1 * g2."""
    t1, q1 = g1[..., :3], g1[..., 3:]
    t2, q2 = g2[..., :3], g2[..., 3:]
    q = so3.quat_mul(q1, q2)
    t = t1 + so3.quat_rotate(q1, t2)
    return jnp.concatenate([t, q], axis=-1)


def inv(g):
    t, q = g[..., :3], g[..., 3:]
    qi = so3.quat_inv(q)
    ti = -so3.quat_rotate(qi, t)
    return jnp.concatenate([ti, qi], axis=-1)


def act(g, p):
    """Apply to 3-points: R p + t."""
    return so3.quat_rotate(g[..., 3:], p) + g[..., :3]


def act4(g, p):
    """Apply to homogeneous [x,y,z,d]: [R xyz + t d, d]."""
    xyz, d = p[..., :3], p[..., 3:4]
    out = so3.quat_rotate(g[..., 3:], xyz) + g[..., :3] * d
    return jnp.concatenate([out, d], axis=-1)


def exp(tau_phi):
    """Exponential map: tangent [rho, phi] -> SE3 7-vector."""
    rho, phi = tau_phi[..., :3], tau_phi[..., 3:]
    q = so3.exp(phi)
    t = jnp.einsum("...ij,...j->...i", so3.left_jacobian(phi), rho)
    return jnp.concatenate([t, q], axis=-1)


def log(g):
    """Logarithm map: SE3 7-vector -> tangent [rho, phi]."""
    t, q = g[..., :3], g[..., 3:]
    phi = so3.log(q)
    rho = jnp.einsum("...ij,...j->...i", so3.left_jacobian_inverse(phi), t)
    return jnp.concatenate([rho, phi], axis=-1)


def retr(g, dx):
    """Retraction Exp(dx) * g (left-multiplicative, as reference
    lietorch groups.py:153-154)."""
    return mul(exp(dx), g)


def adj_matrix(g):
    """Adjoint matrix (...,6,6): [[R, [t]x R], [0, R]]."""
    t, q = g[..., :3], g[..., 3:]
    R = so3.quat_to_matrix(q)
    txR = so3.hat(t) @ R
    Z = jnp.zeros_like(R)
    top = jnp.concatenate([R, txR], axis=-1)
    bot = jnp.concatenate([Z, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def adj(g, a):
    """Adjoint action on tangent vector a (...,6)."""
    return jnp.einsum("...ij,...j->...i", adj_matrix(g), a)


def adjT(g, a):
    """Transposed adjoint action on tangent (co)vector a (...,6)."""
    return jnp.einsum("...ji,...j->...i", adj_matrix(g), a)


def matrix(g):
    """SE3 7-vector -> 4x4 homogeneous matrix."""
    t, q = g[..., :3], g[..., 3:]
    R = so3.quat_to_matrix(q)
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bot = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bot], axis=-2)


def from_matrix(m):
    """4x4 homogeneous matrix -> SE3 7-vector."""
    q = so3.quat_from_matrix(m[..., :3, :3])
    t = m[..., :3, 3]
    return jnp.concatenate([t, q], axis=-1)


def normalize(g):
    """Re-normalize the quaternion part."""
    t, q = g[..., :3], g[..., 3:]
    q = q / jnp.sqrt(jnp.maximum(jnp.sum(q * q, -1, keepdims=True), 1e-24))
    return jnp.concatenate([t, q], axis=-1)
