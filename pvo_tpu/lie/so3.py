"""SO(3) operations on scalar-last quaternions, pure JAX.

Quaternion layout: ``[qx, qy, qz, qw]`` (scalar last), matching the
reference lietorch convention (reference: VO_Module/thirdparty/lietorch/
lietorch/include/so3.h). All functions broadcast over leading dims and are
jit/vmap/grad friendly.

Numerical strategy: every small-angle branch uses the "double-where"
pattern — the singular operand is replaced by a safe value before the
expensive expression is evaluated, so both branches of ``jnp.where`` are
finite in forward AND reverse mode (a plain where still backprops NaN
through the untaken branch).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-6


def _theta_terms(phi):
    """Return (small_mask, theta_sq, theta_safe) where theta_safe == 1
    in the small-angle regime (use Taylor series there instead)."""
    theta_sq = jnp.sum(phi * phi, axis=-1)
    small = theta_sq < _EPS
    theta_sq_safe = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)
    return small, theta_sq, jnp.sqrt(theta_sq_safe)


def _safe_norm(v, axis=-1, keepdims=True):
    sq = jnp.sum(v * v, axis=axis, keepdims=keepdims)
    return jnp.sqrt(jnp.maximum(sq, 1e-24))


def quat_identity(shape=(), dtype=jnp.float32):
    q = jnp.zeros(shape + (4,), dtype)
    return q.at[..., 3].set(1.0)


def quat_mul(q1, q2):
    """Hamilton product, scalar-last layout."""
    v1, w1 = q1[..., :3], q1[..., 3:4]
    v2, w2 = q2[..., :3], q2[..., 3:4]
    w = w1 * w2 - jnp.sum(v1 * v2, axis=-1, keepdims=True)
    v = w1 * v2 + w2 * v1 + jnp.cross(v1, v2)
    return jnp.concatenate([v, w], axis=-1)


def quat_inv(q):
    """Conjugate (assumes unit quaternion)."""
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quat_rotate(q, p):
    """Rotate 3-vector(s) p by unit quaternion q."""
    v, w = q[..., :3], q[..., 3:4]
    uv = jnp.cross(v, p)
    uuv = jnp.cross(v, uv)
    return p + 2.0 * (w * uv + uuv)


def quat_to_matrix(q):
    """Unit quaternion -> 3x3 rotation matrix (last two dims)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def quat_from_matrix(m):
    """3x3 rotation matrix -> scalar-last unit quaternion (branch-free)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    qw_ = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) / 2
    qx_ = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) / 2
    qy_ = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) / 2
    qz_ = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) / 2

    c0 = jnp.stack([(m21 - m12) / (4 * qw_), (m02 - m20) / (4 * qw_),
                    (m10 - m01) / (4 * qw_), qw_], axis=-1)
    c1 = jnp.stack([qx_, (m01 + m10) / (4 * qx_), (m02 + m20) / (4 * qx_),
                    (m21 - m12) / (4 * qx_)], axis=-1)
    c2 = jnp.stack([(m01 + m10) / (4 * qy_), qy_, (m12 + m21) / (4 * qy_),
                    (m02 - m20) / (4 * qy_)], axis=-1)
    c3 = jnp.stack([(m02 + m20) / (4 * qz_), (m12 + m21) / (4 * qz_), qz_,
                    (m10 - m01) / (4 * qz_)], axis=-1)

    cand = jnp.stack([c0, c1, c2, c3], axis=-2)  # (..., 4, 4)
    scores = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22,
                        m22 - m00 - m11], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cand, idx[..., None, None].repeat(4, -1),
                            axis=-2)[..., 0, :]
    return q / _safe_norm(q)


def hat(phi):
    """so(3) hat operator: 3-vector -> 3x3 skew matrix."""
    x, y, z = phi[..., 0], phi[..., 1], phi[..., 2]
    o = jnp.zeros_like(x)
    m = jnp.stack([o, -z, y, z, o, -x, -y, x, o], axis=-1)
    return m.reshape(phi.shape[:-1] + (3, 3))


def exp(phi):
    """SO(3) exponential map: axis-angle 3-vector -> quaternion."""
    small, theta_sq, theta = _theta_terms(phi)
    half = 0.5 * theta
    imag = jnp.where(small, 0.5 - theta_sq / 48.0, jnp.sin(half) / theta)
    real = jnp.where(small, 1.0 - theta_sq / 8.0, jnp.cos(half))
    return jnp.concatenate([imag[..., None] * phi, real[..., None]], axis=-1)


def log(q):
    """SO(3) logarithm map: quaternion -> axis-angle 3-vector."""
    v, w = q[..., :3], q[..., 3]
    sq_n = jnp.sum(v * v, axis=-1)
    small = sq_n < _EPS * _EPS
    n = jnp.sqrt(jnp.where(small, jnp.ones_like(sq_n), sq_n))
    big = 2.0 * jnp.arctan2(n, w) / n
    w_safe = jnp.where(jnp.abs(w) < 1e-12, jnp.ones_like(w), w)
    small_val = (2.0 - 2.0 * sq_n / (3.0 * w_safe * w_safe)) / w_safe
    two_atan = jnp.where(small, small_val, big)
    return two_atan[..., None] * v


def left_jacobian(phi):
    """SO(3) left Jacobian J_l(phi), (...,3,3)."""
    small, theta_sq, th = _theta_terms(phi)
    c1 = jnp.where(small, 0.5 - theta_sq / 24.0,
                   (1.0 - jnp.cos(th)) / (th * th))
    c2 = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0,
                   (th - jnp.sin(th)) / (th * th * th))
    Phi = hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), Phi.shape)
    return I + c1[..., None, None] * Phi + c2[..., None, None] * (Phi @ Phi)


def left_jacobian_inverse(phi):
    """Inverse SO(3) left Jacobian, (...,3,3)."""
    small, theta_sq, th = _theta_terms(phi)
    half = 0.5 * th
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        1.0 / (th * th) - 0.5 * jnp.cos(half) / (th * jnp.sin(half)),
    )
    Phi = hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), Phi.shape)
    return I - 0.5 * Phi + cot_term[..., None, None] * (Phi @ Phi)
