"""Differentiable dense bundle adjustment (training path), pure JAX.

TPU-native rebuild of the reference training BA
(VO_Module/droid_slam/geom/ba.py): one damped Gauss-Newton step on the
reprojection objective, eliminating per-pixel inverse depths through a
dense Schur complement, fully differentiable through ``solve_psd``'s
implicit backward.

Design deltas vs the reference:
  * edge indices are STATIC python/numpy arrays (the training frame graph
    is host-built), so all scatters lower to XLA segment-sums with static
    segment counts — no dynamic shapes under jit;
  * assembly uses ``.at[].add`` dense scatters rather than torch_scatter;
  * the Hessian-block construction is a single batched einsum over pixels
    (MXU-friendly) rather than four separate matmuls.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from pvo_tpu.lie import se3

from . import projective
from .chol import block_solve, schur_solve


def _as_np(idx):
    return np.asarray(idx).astype(np.int64).reshape(-1)


def _edge_blocks(target, weight, poses, disps, intrinsics, ii, jj):
    """Linearize all edges; return per-edge Hessian/rhs/E/C blocks.

    Shapes: Hblk (B,N,12,12) ordered [xi_i (6), xi_j (6)];
    vblk (B,N,12); Ei/Ej (B,N,6,HW); Ck/wk (B,N,HW); r,w for reuse.
    """
    B, N = target.shape[0], target.shape[1]
    ht, wd = disps.shape[-2:]
    HW = ht * wd

    coords, valid, (Ji, Jj, Jz) = projective.projective_transform(
        poses, disps, intrinsics, ii, jj, jacobian=True)

    r = (target - coords).reshape(B, N, HW, 2)
    w = 0.001 * (valid * weight).reshape(B, N, HW, 2)

    # J: (B,N,HW,2,12) with columns [Ji | Jj]
    J = jnp.concatenate([Ji.reshape(B, N, HW, 2, 6),
                         Jj.reshape(B, N, HW, 2, 6)], axis=-1)
    wJ = w[..., None] * J

    # Gauss-Newton blocks; contraction over (pixel, channel) hits the MXU
    Hblk = jnp.einsum("bnkcd,bnkce->bnde", wJ, J)
    vblk = jnp.einsum("bnkcd,bnkc->bnd", wJ, r)

    Jz = Jz.reshape(B, N, HW, 2)
    Ei = jnp.einsum("bnkcd,bnkc->bndk", w[..., None] *
                    Ji.reshape(B, N, HW, 2, 6), Jz)
    Ej = jnp.einsum("bnkcd,bnkc->bndk", w[..., None] *
                    Jj.reshape(B, N, HW, 2, 6), Jz)

    wk = jnp.sum(w * r * Jz, axis=-1)
    Ck = jnp.sum(w * Jz * Jz, axis=-1)
    return Hblk, vblk, Ei, Ej, Ck, wk


def bundle_adjust(target, weight, eta, poses, disps, intrinsics, ii, jj,
                  fixedp=2, ep=0.1, lm=1e-4):
    """One full-BA Gauss-Newton step (poses + inverse depths).

    Matches reference geom/ba.py:31-106. ``ii``/``jj`` must be static
    (python/numpy) index arrays. Returns updated (poses, disps).
    """
    ii = _as_np(ii)
    jj = _as_np(jj)
    B, P_all, ht, wd = disps.shape
    HW = ht * wd
    D = 6

    kx, kk = np.unique(ii, return_inverse=True)
    M = len(kx)

    Hblk, vblk, Ei, Ej, Ck, wk = _edge_blocks(
        target, weight, poses, disps, intrinsics, ii, jj)

    P = P_all - fixedp
    iis = ii - fixedp
    jjs = jj - fixedp

    def smat(A, rows, cols, n, m):
        ok = (rows >= 0) & (cols >= 0) & (rows < n) & (cols < m)
        idx = np.where(ok, rows * m + cols, n * m)  # overflow bucket
        out = jnp.zeros((B, n * m + 1) + A.shape[2:], A.dtype)
        return out.at[:, idx].add(A)[:, :n * m]

    def svec(bv, rows, n):
        ok = (rows >= 0) & (rows < n)
        idx = np.where(ok, rows, n)
        out = jnp.zeros((B, n + 1) + bv.shape[2:], bv.dtype)
        return out.at[:, idx].add(bv)[:, :n]

    Hii, Hij = Hblk[..., :6, :6], Hblk[..., :6, 6:]
    Hji, Hjj = Hblk[..., 6:, :6], Hblk[..., 6:, 6:]

    H = (smat(Hii, iis, iis, P, P) + smat(Hij, iis, jjs, P, P) +
         smat(Hji, jjs, iis, P, P) + smat(Hjj, jjs, jjs, P, P))
    E = smat(Ei, iis, kk, P, M) + smat(Ej, jjs, kk, P, M)
    v = svec(vblk[..., :6], iis, P) + svec(vblk[..., 6:], jjs, P)
    C = svec(Ck, kk, M)
    w = svec(wk, kk, M)

    C = C + eta.reshape(C.shape) + 1e-7

    H = H.reshape(B, P, P, D, D)
    E = E.reshape(B, P, M, D, HW)

    dx, dz = schur_solve(H, E, C, v, w, ep=ep, lm=lm)

    # retractions: only poses [fixedp, P_all) move; depths at kx move
    dx_full = jnp.zeros((B, P_all, D), poses.dtype).at[:, fixedp:].set(dx)
    poses = se3.retr(poses, dx_full)

    dz_full = jnp.zeros((B, P_all, HW), disps.dtype).at[:, kx].add(dz)
    disps = disps + dz_full.reshape(B, P_all, ht, wd)

    disps = jnp.where(disps > 10.0, jnp.zeros_like(disps), disps)
    disps = jnp.maximum(disps, 0.0)
    return poses, disps


def motion_only_ba(target, weight, eta, poses, disps, intrinsics, ii, jj,
                   fixedp=1, ep=0.1, lm=1e-4):
    """Motion-only BA step (poses only; reference geom/ba.py:109-157)."""
    del eta
    ii = _as_np(ii)
    jj = _as_np(jj)
    B, P_all = poses.shape[:2]
    D = 6

    Hblk, vblk, _, _, _, _ = _edge_blocks(
        target, weight, poses, disps, intrinsics, ii, jj)

    P = P_all - fixedp
    iis = ii - fixedp
    jjs = jj - fixedp

    def smat(A, rows, cols, n, m):
        ok = (rows >= 0) & (cols >= 0) & (rows < n) & (cols < m)
        idx = np.where(ok, rows * m + cols, n * m)
        out = jnp.zeros((B, n * m + 1) + A.shape[2:], A.dtype)
        return out.at[:, idx].add(A)[:, :n * m]

    def svec(bv, rows, n):
        ok = (rows >= 0) & (rows < n)
        idx = np.where(ok, rows, n)
        out = jnp.zeros((B, n + 1) + bv.shape[2:], bv.dtype)
        return out.at[:, idx].add(bv)[:, :n]

    Hii, Hij = Hblk[..., :6, :6], Hblk[..., :6, 6:]
    Hji, Hjj = Hblk[..., 6:, :6], Hblk[..., 6:, 6:]
    H = (smat(Hii, iis, iis, P, P) + smat(Hij, iis, jjs, P, P) +
         smat(Hji, jjs, iis, P, P) + smat(Hjj, jjs, jjs, P, P))
    v = svec(vblk[..., :6], iis, P) + svec(vblk[..., 6:], jjs, P)

    dx = block_solve(H.reshape(B, P, P, D, D), v, ep=ep, lm=lm)

    dx_full = jnp.zeros((B, P_all, D), poses.dtype).at[:, fixedp:].set(dx)
    return se3.retr(poses, dx_full)
