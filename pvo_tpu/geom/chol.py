"""Damped Cholesky / Schur-complement solvers with implicit backward.

TPU-native equivalent of the reference solvers
(VO_Module/droid_slam/geom/chol.py): a PSD solve with the implicit
``dH = -x dz^T`` backward, a damped block solve over (B,N,D) pose systems,
and a dense Schur-complement solve for the training-time bundle adjustment.

Failure handling mirrors the reference (zeros on decomposition failure,
chol.py:8-18) but is branchless: NaNs from a failed factorization are
detected and the solution masked to zero, so a bad linearization cannot
crash a jitted train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular


def _cho_solve(L, b):
    """Batched triangular solve pair: (L L^T) x = b."""
    y = solve_triangular(L, b, lower=True)
    return solve_triangular(jnp.swapaxes(L, -1, -2), y, lower=False)


def _chol_solve(H, b):
    L = jnp.linalg.cholesky(H)
    x = _cho_solve(L, b)
    ok = jnp.all(jnp.isfinite(x), axis=(-2, -1), keepdims=True)
    return jnp.where(ok, x, jnp.zeros_like(x)), L, ok


@jax.custom_vjp
def solve_psd(H, b):
    """Solve H x = b for PSD H (batched over leading dims).

    H: (..., M, M), b: (..., M, K). Returns zeros where the
    factorization failed (non-PSD H), like the reference CholeskySolver.
    """
    x, _, _ = _chol_solve(H, b)
    return x


def _solve_psd_fwd(H, b):
    x, L, ok = _chol_solve(H, b)
    return x, (L, x, ok)


def _solve_psd_bwd(res, g):
    L, x, ok = res
    dz = _cho_solve(L, g)
    dz = jnp.where(ok, dz, jnp.zeros_like(dz))
    dH = -jnp.matmul(x, jnp.swapaxes(dz, -1, -2))
    return dH, dz


solve_psd.defvjp(_solve_psd_fwd, _solve_psd_bwd)


def block_solve(H, b, ep=0.1, lm=1e-4):
    """Solve the damped normal equations over pose blocks.

    H: (B, N, N, D, D) block matrix, b: (B, N, D).
    Damping: ``H += (ep + lm*H) I`` on the diagonal (reference
    chol.py:32-43). Returns dx (B, N, D).
    """
    B, N, _, D, _ = H.shape
    I = jnp.eye(N * D, dtype=H.dtype)
    Hd = jnp.transpose(H, (0, 1, 3, 2, 4)).reshape(B, N * D, N * D)
    Hd = Hd + (ep + lm * Hd) * I
    x = solve_psd(Hd, b.reshape(B, N * D, 1))
    return x.reshape(B, N, D)


def schur_solve(H, E, C, v, w, ep=0.1, lm=1e-4):
    """Dense Schur-complement solve for the training BA.

    H: (B, P, P, D, D) pose-pose blocks.
    E: (B, P, M, D, HW) pose-depth blocks.
    C: (B, M, HW) depth diagonal. v: (B, P, D). w: (B, M, HW).
    Returns (dx (B,P,D), dz (B,M,HW)).
    """
    B, P, M, D, HW = E.shape
    Hd = jnp.transpose(H, (0, 1, 3, 2, 4)).reshape(B, P * D, P * D)
    Ed = jnp.transpose(E, (0, 1, 3, 2, 4)).reshape(B, P * D, M * HW)
    Q = (1.0 / C).reshape(B, M * HW, 1)

    I = jnp.eye(P * D, dtype=H.dtype)
    Hd = Hd + (ep + lm * Hd) * I

    vd = v.reshape(B, P * D, 1)
    wd = w.reshape(B, M * HW, 1)

    Et = jnp.swapaxes(Ed, -1, -2)
    S = Hd - jnp.matmul(Ed, Q * Et)
    rhs = vd - jnp.matmul(Ed, Q * wd)

    dx = solve_psd(S, rhs)
    dz = Q * (wd - jnp.matmul(Et, dx))
    return dx.reshape(B, P, D), dz.reshape(B, M, HW)


def cholesky_lower(H):
    """Plain lower Cholesky with NaN-to-zero masking (utility)."""
    L = jnp.linalg.cholesky(H)
    ok = jnp.all(jnp.isfinite(L), axis=(-2, -1), keepdims=True)
    return jnp.where(ok, L, jnp.zeros_like(L)), ok


def solve_lower(L, b):
    return solve_triangular(L, b, lower=True)
