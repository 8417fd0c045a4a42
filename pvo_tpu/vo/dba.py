"""Fused inference-time dense bundle adjustment (DBA), TPU-native.

Rebuild of the reference's CUDA BA driver (VO_Module/src/droid_kernels.cu
ba_cuda:1293-1410 + SparseBlock/schur_block) with an on-device design:

  * the reference assembles a SPARSE pose system on the CPU with Eigen
    and solves with SimplicialLLT — a host round-trip every BA iteration.
    Here the reduced camera system is a DENSE (6P x 6P) matrix built with
    XLA scatters and solved with an on-device Cholesky: P is a bounded
    optimization window (frontend ~25, backend <= buffer), where dense
    Cholesky on the MXU beats shipping blocks to the host;
  * the depth (Schur) elimination never materializes the (6P x K*HW)
    E matrix densely. S = E Q E^T decomposes into three structured
    contributions — self x self (per depth frame), self x edge, and
    edge x edge over host-built pairs of edges sharing a source frame —
    each a batched 6xHW @ HWx6 matmul followed by a segment scatter.
    This matches the reference's co-observation schur_block
    (droid_kernels.cu:1201-1290) but stays on device;
  * all shapes are static: edges / pairs are padded to bucket sizes, the
    pose window P and depth window K are compile-time buckets, and the
    window offsets (t0, t1, w0) are traced scalars, so one compilation
    serves the whole run.

Everything is fp32; the Levenberg damping (diag += ep + lm*diag) plus the
per-pixel eta damping keeps the normal equations well-conditioned without
the reference's float64 Eigen solve.
"""

from __future__ import annotations

import functools
from collections import defaultdict

import numpy as np

import jax
import jax.numpy as jnp

from pvo_tpu.geom.ba import _edge_blocks
from pvo_tpu.geom.chol import solve_psd
from pvo_tpu.lie import se3


def build_edge_pairs(ii, valid, max_pairs):
    """Host helper: ordered pairs (a, b) of edge indices sharing the same
    source frame ii (including the diagonal a == b), padded to
    ``max_pairs``. These drive the edge x edge Schur terms."""
    groups = defaultdict(list)
    for e, (i, ok) in enumerate(zip(np.asarray(ii), np.asarray(valid))):
        if ok:
            groups[int(i)].append(e)
    pa, pb = [], []
    for g in groups.values():
        for a in g:
            for b in g:
                pa.append(a)
                pb.append(b)
    n = len(pa)
    if n > max_pairs:
        raise ValueError(f"edge-pair overflow: {n} > {max_pairs}")
    pa = np.pad(np.asarray(pa, np.int32), (0, max_pairs - n))
    pb = np.pad(np.asarray(pb, np.int32), (0, max_pairs - n))
    pv = np.zeros(max_pairs, bool)
    pv[:n] = True
    return pa, pb, pv


@functools.partial(
    jax.jit,
    static_argnames=("P", "K", "iters", "motion_only"))
def dba(poses, disps, intrinsics, target, weight, eta, ii, jj, valid,
        pairs_a, pairs_b, pairs_valid, t0, t1, w0,
        P, K, iters=2, motion_only=False, ep=0.1, lm=1e-4):
    """Run ``iters`` damped Gauss-Newton iterations.

    Args:
      poses: (F, 7) w2c SE3 for the whole video buffer.
      disps: (F, h, w) inverse depth.
      intrinsics: (4,) shared [fx, fy, cx, cy] at 1/8 res.
      target, weight: (E, h, w, 2) per-edge flow targets / confidences.
      eta: (K, h, w) depth damping for frames [w0, w0+K); slots beyond
        the active window must be filled with a small positive value.
      ii, jj: (E,) int32 edge endpoints; ``valid`` masks padding.
      pairs_*: host-built edge pairs (see build_edge_pairs).
      t0, t1: pose-optimization window [t0, t1) (traced scalars).
      w0: depth-window origin (traced scalar).
      P, K: static pose/depth window buckets (P >= t1-t0, K covers all
        frames referenced by ii).
    Returns updated (poses, disps).
    """
    F = poses.shape[0]
    E = ii.shape[0]
    h, w = disps.shape[-2:]
    HW = h * w
    D = 6

    ii = ii.astype(jnp.int32)
    jj = jj.astype(jnp.int32)
    vmask = valid.astype(jnp.float32)

    intr_b = jnp.broadcast_to(intrinsics, (1, F, 4))
    eta_flat = eta.reshape(K, HW)

    pi = ii - t0
    pj = jj - t0
    m = ii - w0

    ok_i = valid & (pi >= 0) & (pi < P)
    ok_j = valid & (pj >= 0) & (pj < P)
    ok_m = valid & (m >= 0) & (m < K)

    def seg(x, idx, ok, n):
        """segment_sum with overflow bucket for masked rows."""
        idx = jnp.where(ok, idx, n)
        return jax.ops.segment_sum(x, idx, num_segments=n + 1)[:n]

    def one_iteration(poses, disps):
        Hblk, vblk, Ei, Ej, Ck, wk = _edge_blocks(
            target[None], weight[None], poses[None], disps[None],
            intr_b, ii, jj)
        # drop batch dim; zero padded edges
        Hblk = Hblk[0] * vmask[:, None, None]
        vblk = vblk[0] * vmask[:, None]
        Ei = Ei[0] * vmask[:, None, None]
        Ej = Ej[0] * vmask[:, None, None]
        Ck = Ck[0] * vmask[:, None]
        wk = wk[0] * vmask[:, None]

        # ---- pose-pose Hessian (P,P,6,6) ----
        # ONE segment_sum over the 4E stacked blocks instead of four:
        # the DBA is latency-bound in dozens of small ops
        # (scripts/bench_dba.py), so op-count is the lever here
        Hii, Hij = Hblk[:, :6, :6], Hblk[:, :6, 6:]
        Hji, Hjj = Hblk[:, 6:, :6], Hblk[:, 6:, 6:]

        def _sidx(rows, cols, ok):
            return jnp.where(ok, rows * P + cols, P * P)

        hidx = jnp.concatenate([
            _sidx(pi, pi, ok_i), _sidx(pi, pj, ok_i & ok_j),
            _sidx(pj, pi, ok_i & ok_j), _sidx(pj, pj, ok_j)])
        H = jax.ops.segment_sum(
            jnp.concatenate([Hii, Hij, Hji, Hjj]), hidx,
            num_segments=P * P + 1)[:P * P]
        H = H.reshape(P, P, D, D)

        vidx = jnp.concatenate([
            jnp.where(ok_i, pi, P), jnp.where(ok_j, pj, P)])
        v = jax.ops.segment_sum(
            jnp.concatenate([vblk[:, :6], vblk[:, 6:]]), vidx,
            num_segments=P + 1)[:P]

        if motion_only:
            S = H
            rhs = v
        else:
            # ---- depth aggregation ----
            C = seg(Ck, m, ok_m, K) + eta_flat          # (K, HW)
            w_m = seg(wk, m, ok_m, K)                   # (K, HW)
            Q = 1.0 / C

            # self blocks: Eii summed per depth frame (pose ii must be
            # a free variable; fixed-pose Eii contributions vanish)
            Ei_m = seg(Ei, m, ok_m & ok_i, K)           # (K, 6, HW)
            pm = jnp.arange(K, dtype=jnp.int32) + w0 - t0
            ok_pm = (pm >= 0) & (pm < P)

            # structured Schur terms: (a) self x self per depth frame,
            # (b) self x edge — batched into one einsum (both share
            # the xdh,xh,xeh->xde contraction)
            Ei_e = Ei_m[jnp.clip(m, 0, K - 1)]          # (E, 6, HW)
            Q_e = Q[jnp.clip(m, 0, K - 1)]              # (E, HW)

            L = jnp.concatenate([Ei_m, Ei_e])           # (K+E, 6, HW)
            Qs = jnp.concatenate([Q, Q_e])
            Rr = jnp.concatenate([Ei_m, Ej])
            SS = jnp.einsum("xdh,xh,xeh->xde", L, Qs, Rr)
            SSa = SS[:K]
            SSb = SS[K:]

            ok_bm = ok_i & ok_j & ok_m
            sidx = jnp.concatenate([
                _sidx(pm, pm, ok_pm), _sidx(pi, pj, ok_bm),
                _sidx(pj, pi, ok_bm)])
            Sdat = jnp.concatenate([
                SSa, SSb, jnp.swapaxes(SSb, -1, -2)])
            S_sum = jax.ops.segment_sum(
                Sdat, sidx, num_segments=P * P + 1)

            # (c) edge x edge over same-source pairs, CHUNKED: the
            # gathered (PR, 6, HW) operands at backend scale (PR up to
            # 512k pairs) would need tens of GB of HBM in one shot —
            # this OOM'd terminate at 100 keyframes. Stream pair
            # chunks through a fori_loop accumulator instead.
            PR = pairs_a.shape[0]
            CH = min(PR, 2048)
            # dynamic_slice clamps at the end — a ragged tail would
            # double-count; bucket sizes are powers of two so CH
            # always divides PR
            assert PR % CH == 0, (PR, CH)
            n_chunks = PR // CH

            def pair_body(c, acc):
                o = c * CH
                pa_c = jax.lax.dynamic_slice_in_dim(pairs_a, o, CH)
                pb_c = jax.lax.dynamic_slice_in_dim(pairs_b, o, CH)
                pv_c = jax.lax.dynamic_slice_in_dim(pairs_valid, o, CH)
                Ga = Ej[pa_c]
                Gb = Ej[pb_c]
                Qp = Q_e[pa_c]
                SSc = jnp.einsum("pdh,ph,peh->pde", Ga, Qp, Gb)
                pj_a = pj[pa_c]
                pj_b = pj[pb_c]
                ok_c = (pv_c & (pj_a >= 0) & (pj_a < P) &
                        (pj_b >= 0) & (pj_b < P))
                return acc + jax.ops.segment_sum(
                    SSc, _sidx(pj_a, pj_b, ok_c),
                    num_segments=P * P + 1)

            if PR > CH:
                # pad slices read within the padded bucket; pairs_valid
                # masks them
                S_sum = jax.lax.fori_loop(0, n_chunks, pair_body,
                                          S_sum)
            else:
                S_sum = pair_body(0, S_sum)

            S = H.reshape(P * P, D, D) - S_sum[:P * P]
            S = S.reshape(P, P, D, D)

            # rhs correction: v - E Q w (self + edge terms batched)
            w_e = w_m[jnp.clip(m, 0, K - 1)]
            rc = jnp.einsum("xdh,xh,xh->xd",
                            jnp.concatenate([Ei_m, Ej]),
                            jnp.concatenate([Q, Q_e]),
                            jnp.concatenate([w_m, w_e]))
            ridx = jnp.concatenate([
                jnp.where(ok_pm, pm, P),
                jnp.where(ok_j & ok_m, pj, P)])
            rhs = v - jax.ops.segment_sum(
                rc, ridx, num_segments=P + 1)[:P]

        # ---- damped dense solve ----
        Sd = jnp.transpose(S, (0, 2, 1, 3)).reshape(P * D, P * D)
        diag = jnp.diagonal(Sd)
        Sd = Sd + jnp.diag(ep + lm * diag)
        dx = solve_psd(Sd[None], rhs.reshape(1, P * D, 1))
        dx = dx.reshape(P, D)

        # ---- pose retraction over [t0, t1) ----
        rows = jnp.arange(P, dtype=jnp.int32) + t0
        ok_rows = rows < t1
        dx_full = jnp.zeros((F + 1, D), poses.dtype).at[
            jnp.where(ok_rows, rows, F)].set(dx)[:F]
        new_poses = se3.retr(poses, dx_full)

        if motion_only:
            return new_poses, disps

        # ---- depth back-substitution ----
        dx_pm = jnp.where(ok_pm[:, None],
                          dx[jnp.clip(pm, 0, P - 1)], 0.0)  # (K, 6)
        t_self = jnp.einsum("kdh,kd->kh", Ei_m, dx_pm)
        dx_pj = jnp.where(ok_j[:, None], dx[jnp.clip(pj, 0, P - 1)], 0.0)
        t_edge = seg(jnp.einsum("edh,ed->eh", Ej, dx_pj), m, ok_m, K)
        dz = Q * (w_m - t_self - t_edge)                # (K, HW)

        krows = jnp.arange(K, dtype=jnp.int32) + w0
        ok_k = krows < t1
        dz = jnp.where(ok_k[:, None], dz, 0.0)
        new_disps = jnp.reshape(
            disps.reshape(F, HW) + jnp.zeros(
                (F + 1, HW), disps.dtype).at[
                jnp.where(ok_k, krows, F)].set(
                    dz.astype(disps.dtype))[:F],
            (F, h, w))
        new_disps = jnp.maximum(new_disps, 0.001)
        return new_poses, new_disps

    def body(_, carry):
        return one_iteration(*carry)

    poses, disps = jax.lax.fori_loop(0, iters, body, (poses, disps))
    return poses, disps
