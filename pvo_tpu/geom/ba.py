"""Differentiable dense bundle adjustment (training path), pure JAX.

TPU-native rebuild of the reference training BA
(VO_Module/droid_slam/geom/ba.py): one damped Gauss-Newton step on the
reprojection objective, eliminating per-pixel inverse depths through a
dense Schur complement, fully differentiable through ``solve_psd``'s
implicit backward.

Design deltas vs the reference:
  * edge indices are STATIC python/numpy arrays (the training frame graph
    is host-built), so the assembly one-hots are compile-time CONSTANTS;
  * assembly contracts against those constant one-hots on the MXU
    instead of torch_scatter / XLA scatter-adds (scatters serialize
    into dynamic-update-slices on TPU — see pvo_tpu/vo/dba.py `seg`);
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


def _const_oh(idx, ok, n):
    """Static (E, n) one-hot as a compile-time constant (masked rows
    are all-zero). Contracting against it replaces an XLA scatter-add
    (which serializes on TPU) with an MXU matmul."""
    idx = np.asarray(idx)
    E = len(idx)
    oh = np.zeros((E, n), np.float32)
    sel = np.asarray(ok)
    oh[np.arange(E)[sel], idx[sel]] = 1.0
    return jnp.asarray(oh)


def _smat(A, rows, cols, n, m):
    ok = (rows >= 0) & (cols >= 0) & (rows < n) & (cols < m)
    oh = _const_oh(rows * m + cols, ok, n * m)
    return jnp.einsum("es,be...->bs...", oh, A)


def _svec(bv, rows, n):
    ok = (rows >= 0) & (rows < n)
    oh = _const_oh(rows, ok, n)
    return jnp.einsum("es,be...->bs...", oh, bv)


def _edge_blocks(target, weight, poses, disps, intrinsics, ii, jj):
    """Linearize all edges; return per-edge Hessian/rhs/E/C blocks.

    Shapes: Hblk (B,N,12,12) ordered [xi_i (6), xi_j (6)];
    vblk (B,N,12); Ei/Ej (B,N,6,HW); Ck/wk (B,N,HW); r,w for reuse.
    """
    B, N = target.shape[0], target.shape[1]
    ht, wd = disps.shape[-2:]
    HW = ht * wd

    # PLANE-layout linearization: jacobian components as (B,N,2,*,HW)
    # with HW on the lane dim — the stacked (...,HW,2,6) layout wastes
    # 95% of the lanes and costs ~3x here (scripts/bench_dba.py)
    coords, valid, Ji_pl, Jj_pl, Jz_pl = \
        projective.projective_jacobian_planes(
            poses, disps, intrinsics, ii, jj)

    r = jnp.moveaxis((target - coords).reshape(B, N, HW, 2), -1, 2)
    w = 0.001 * jnp.moveaxis(
        (valid * weight).reshape(B, N, HW, 2), -1, 2)  # (B,N,2,HW)

    J = jnp.concatenate([Ji_pl, Jj_pl], axis=3)        # (B,N,2,12,HW)
    wJ = w[:, :, :, None] * J

    # Gauss-Newton blocks; contraction over (channel, pixel) hits the
    # MXU with the pixel dim contiguous
    Hblk = jnp.einsum("bncdh,bnceh->bnde", wJ, J)
    vblk = jnp.einsum("bncdh,bnch->bnd", wJ, r)

    Ei = jnp.einsum("bncdh,bnch->bndh", wJ[:, :, :, :6], Jz_pl)
    Ej = jnp.einsum("bncdh,bnch->bndh", wJ[:, :, :, 6:], Jz_pl)

    wk = jnp.sum(w * r * Jz_pl, axis=2)
    Ck = jnp.sum(w * Jz_pl * Jz_pl, axis=2)
    return Hblk, vblk, Ei, Ej, Ck, wk


def _depth_only_step(target, weight, eta, poses, disps, intrinsics,
                     ii, jj, kx, kk):
    """Exact BA step when every pose is fixed (P == 0).

    With no free poses the Schur system degenerates to the depth
    diagonal: dx is empty and dz = (C + eta)^-1 w. test_vo2's export
    runs exactly this case (2-frame window, fixedp=2, reference
    evaluation_scripts/test_vo2.py), where the full path spends
    ~26 ms/iteration assembling pose jacobians and Hessian blocks
    that multiply an empty dx (docs/PERF.md round 3)."""
    B, N = target.shape[0], target.shape[1]
    ht, wd = disps.shape[-2:]
    HW = ht * wd
    M = len(kx)

    coords, valid, _, _, Jz_pl = projective.projective_jacobian_planes(
        poses, disps, intrinsics, ii, jj, pose_jac=False)

    r = jnp.moveaxis((target - coords).reshape(B, N, HW, 2), -1, 2)
    w = 0.001 * jnp.moveaxis(
        (valid * weight).reshape(B, N, HW, 2), -1, 2)   # (B,N,2,HW)

    wk = jnp.sum(w * r * Jz_pl, axis=2)                 # (B,N,HW)
    Ck = jnp.sum(w * Jz_pl * Jz_pl, axis=2)

    C = _svec(Ck, kk, M)
    wv = _svec(wk, kk, M)
    C = C + eta.reshape(C.shape) + 1e-7
    return wv / C                                        # dz (B,M,HW)


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

    if P_all - fixedp <= 0:
        dz = _depth_only_step(target, weight, eta, poses, disps,
                              intrinsics, ii, jj, kx, kk)
        oh_k = _const_oh(kx, np.ones(len(kx), bool), P_all)
        dz_full = jnp.einsum("ms,bm...->bs...", oh_k, dz)
        disps = disps + dz_full.reshape(B, P_all, ht, wd)
        disps = jnp.where(disps > 10.0, jnp.zeros_like(disps), disps)
        disps = jnp.maximum(disps, 0.0)
        return poses, disps

    Hblk, vblk, Ei, Ej, Ck, wk = _edge_blocks(
        target, weight, poses, disps, intrinsics, ii, jj)

    P = P_all - fixedp
    iis = ii - fixedp
    jjs = jj - fixedp


    Hii, Hij = Hblk[..., :6, :6], Hblk[..., :6, 6:]
    Hji, Hjj = Hblk[..., 6:, :6], Hblk[..., 6:, 6:]

    H = (_smat(Hii, iis, iis, P, P) + _smat(Hij, iis, jjs, P, P) +
         _smat(Hji, jjs, iis, P, P) + _smat(Hjj, jjs, jjs, P, P))
    E = _smat(Ei, iis, kk, P, M) + _smat(Ej, jjs, kk, P, M)
    v = _svec(vblk[..., :6], iis, P) + _svec(vblk[..., 6:], jjs, P)
    C = _svec(Ck, kk, M)
    w = _svec(wk, kk, M)

    C = C + eta.reshape(C.shape) + 1e-7

    H = H.reshape(B, P, P, D, D)
    E = E.reshape(B, P, M, D, HW)

    dx, dz = schur_solve(H, E, C, v, w, ep=ep, lm=lm)

    # retractions: only poses [fixedp, P_all) move; depths at kx move
    dx_full = jnp.zeros((B, P_all, D), poses.dtype).at[:, fixedp:].set(dx)
    poses = se3.retr(poses, dx_full)

    oh_k = _const_oh(kx, np.ones(len(kx), bool), P_all)
    dz_full = jnp.einsum("ms,bm...->bs...", oh_k, dz)
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


    Hii, Hij = Hblk[..., :6, :6], Hblk[..., :6, 6:]
    Hji, Hjj = Hblk[..., 6:, :6], Hblk[..., 6:, 6:]
    H = (_smat(Hii, iis, iis, P, P) + _smat(Hij, iis, jjs, P, P) +
         _smat(Hji, jjs, iis, P, P) + _smat(Hjj, jjs, jjs, P, P))
    v = _svec(vblk[..., :6], iis, P) + _svec(vblk[..., 6:], jjs, P)

    dx = block_solve(H.reshape(B, P, P, D, D), v, ep=ep, lm=lm)

    dx_full = jnp.zeros((B, P_all, D), poses.dtype).at[:, fixedp:].set(dx)
    return se3.retr(poses, dx_full)
