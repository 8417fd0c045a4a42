"""Tests for the fused inference DBA: dense-oracle equivalence +
convergence on a synthetic scene."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pvo_tpu.geom import projective
from pvo_tpu.geom.ba import _edge_blocks
from pvo_tpu.lie import se3
from pvo_tpu.vo import dba as dba_mod

F, H, W = 7, 4, 6
HW = H * W


def make_scene(key, noise=0.03):
    ks = jax.random.split(key, 4)
    base = jnp.array([0.12, 0.0, 0.03, 0.0, 0.015, 0.0])
    tangents = base * jnp.arange(F)[:, None] + \
        0.01 * jax.random.normal(ks[0], (F, 6))
    poses_gt = se3.exp(tangents)
    disps_gt = 0.8 + 0.2 * jax.random.uniform(ks[1], (F, H, W))
    intr = jnp.array([10.0, 10.0, W / 2.0, H / 2.0])

    dp = noise * jax.random.normal(ks[2], (F, 6))
    dp = dp.at[:1].set(0.0)
    poses0 = se3.mul(se3.exp(dp), poses_gt)
    disps0 = jnp.clip(
        disps_gt + noise * jax.random.normal(ks[3], disps_gt.shape),
        0.1, None)
    return poses_gt, disps_gt, poses0, disps0, intr


def ring_graph(n, r=2):
    ii, jj = [], []
    for i in range(n):
        for j in range(n):
            if i != j and abs(i - j) <= r:
                ii.append(i)
                jj.append(j)
    return np.array(ii, np.int32), np.array(jj, np.int32)


def pad_edges(ii, jj, E_pad):
    E = len(ii)
    valid = np.zeros(E_pad, bool)
    valid[:E] = True
    ii = np.pad(ii, (0, E_pad - E))
    jj = np.pad(jj, (0, E_pad - E))
    return (jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(valid))


class TestDBAOracle:
    @pytest.mark.slow
    def test_matches_dense_schur(self):
        """One dba iteration == dense-E Schur oracle (same damping)."""
        key = jax.random.PRNGKey(0)
        poses_gt, disps_gt, poses, disps, intr = make_scene(key)
        ii_np, jj_np = ring_graph(F, r=2)
        E = len(ii_np)
        E_pad = E + 3
        ii, jj, valid = pad_edges(ii_np, jj_np, E_pad)

        target, _ = projective.projective_transform(
            poses_gt[None], disps_gt[None], jnp.broadcast_to(
                intr, (1, F, 4)), ii_np, jj_np)
        target = jnp.concatenate(
            [target[0], jnp.zeros((3, H, W, 2))], 0)
        weight = jnp.ones_like(target) * valid[:, None, None, None]

        t0, t1, w0 = 1, F, 0
        P = K = F  # window covers everything
        eta = 1e-3 * jnp.ones((K, H, W))

        pa, pb, pv = dba_mod.build_edge_pairs(
            np.asarray(ii), np.asarray(valid), max_pairs=200)

        new_poses, new_disps = dba_mod.dba(
            poses, disps, intr, target, weight, eta,
            ii, jj, valid, jnp.asarray(pa), jnp.asarray(pb),
            jnp.asarray(pv), t0, t1, w0, P=P, K=K, iters=1)

        # ---- dense oracle ----
        Hb, vb, Ei, Ej, Ck, wk = [
            np.asarray(x[0]) for x in _edge_blocks(
                target[None], weight[None], poses[None], disps[None],
                jnp.broadcast_to(intr, (1, F, 4)), np.asarray(ii),
                np.asarray(jj))]
        vmask = np.asarray(valid, np.float32)
        Hb = Hb * vmask[:, None, None]
        vb = vb * vmask[:, None]
        Ei = Ei * vmask[:, None, None]
        Ej = Ej * vmask[:, None, None]
        Ck = Ck * vmask[:, None]
        wk = wk * vmask[:, None]

        Pn = (t1 - t0) * 6
        Hf = np.zeros((Pn, Pn))
        vf = np.zeros(Pn)
        Ef = np.zeros((Pn, K * HW))
        Cf = np.zeros(K * HW)
        wf = np.zeros(K * HW)
        eta_f = np.asarray(eta).reshape(-1)

        for e in range(E_pad):
            if not valid[e]:
                continue
            i, j = int(ii[e]) - t0, int(jj[e]) - t0
            mi = int(ii[e]) - w0
            sl = lambda a: slice(6 * a, 6 * a + 6)
            dsl = slice(mi * HW, (mi + 1) * HW)
            if i >= 0:
                Hf[sl(i), sl(i)] += Hb[e, :6, :6]
                vf[sl(i)] += vb[e, :6]
                Ef[sl(i), dsl] += Ei[e]
            if i >= 0 and j >= 0:
                Hf[sl(i), sl(j)] += Hb[e, :6, 6:]
                Hf[sl(j), sl(i)] += Hb[e, 6:, :6]
            if j >= 0:
                Hf[sl(j), sl(j)] += Hb[e, 6:, 6:]
                vf[sl(j)] += vb[e, 6:]
                Ef[sl(j), dsl] += Ej[e]
            Cf[dsl] += Ck[e]
            wf[dsl] += wk[e]

        Q = 1.0 / (Cf + eta_f)
        S = Hf - (Ef * Q) @ Ef.T
        rhs = vf - Ef @ (Q * wf)
        ep, lm = 0.1, 1e-4
        S += np.diag(ep + lm * np.diag(S))
        dx = np.linalg.solve(S, rhs)
        dz = Q * (wf - Ef.T @ dx)

        # oracle retraction
        dx_full = np.zeros((F, 6))
        dx_full[t0:t1] = dx.reshape(-1, 6)
        poses_oracle = np.asarray(se3.retr(poses, jnp.asarray(dx_full)))
        disps_oracle = np.maximum(
            np.asarray(disps) + dz.reshape(F, H, W), 0.001)

        np.testing.assert_allclose(new_poses, poses_oracle,
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(new_disps, disps_oracle,
                                   rtol=1e-4, atol=1e-5)

    @pytest.mark.slow
    def test_convergence(self):
        key = jax.random.PRNGKey(5)
        poses_gt, disps_gt, poses, disps, intr = make_scene(key)
        ii_np, jj_np = ring_graph(F, r=2)
        E_pad = len(ii_np) + 2
        ii, jj, valid = pad_edges(ii_np, jj_np, E_pad)

        target, _ = projective.projective_transform(
            poses_gt[None], disps_gt[None],
            jnp.broadcast_to(intr, (1, F, 4)), ii_np, jj_np)
        target = jnp.concatenate([target[0], jnp.zeros((2, H, W, 2))], 0)
        weight = jnp.ones_like(target) * valid[:, None, None, None]

        eta = 1e-4 * jnp.ones((F, H, W))
        pa, pb, pv = dba_mod.build_edge_pairs(
            np.asarray(ii), np.asarray(valid), max_pairs=200)

        def err(p, d):
            c, v = projective.projective_transform(
                p[None], d[None], jnp.broadcast_to(intr, (1, F, 4)),
                ii_np, jj_np)
            return float(jnp.sqrt(jnp.mean(
                v * (target[None, :len(ii_np)] - c) ** 2)))

        e0 = err(poses, disps)
        for _ in range(8):
            poses, disps = dba_mod.dba(
                poses, disps, intr, target, weight, eta, ii, jj, valid,
                jnp.asarray(pa), jnp.asarray(pb), jnp.asarray(pv),
                1, F, 0, P=F, K=F, iters=2)
        e1 = err(poses, disps)
        assert e1 < 0.15 * e0, (e0, e1)

    def test_motion_only(self):
        key = jax.random.PRNGKey(6)
        poses_gt, disps_gt, poses, _, intr = make_scene(key)
        ii_np, jj_np = ring_graph(F, r=2)
        ii, jj, valid = pad_edges(ii_np, jj_np, len(ii_np))
        target, _ = projective.projective_transform(
            poses_gt[None], disps_gt[None],
            jnp.broadcast_to(intr, (1, F, 4)), ii_np, jj_np)
        weight = jnp.ones_like(target[0])
        eta = 1e-4 * jnp.ones((F, H, W))
        pa, pb, pv = dba_mod.build_edge_pairs(
            np.asarray(ii), np.asarray(valid), max_pairs=200)

        def pose_err(p):
            return float(jnp.abs(se3.log(se3.mul(se3.inv(p),
                                                 poses_gt))).max())
        e0 = pose_err(poses)
        for _ in range(10):
            poses, _ = dba_mod.dba(
                poses, disps_gt, intr, target[0], weight, eta, ii, jj,
                valid, jnp.asarray(pa), jnp.asarray(pb), jnp.asarray(pv),
                1, F, 0, P=F, K=F, iters=1, motion_only=True)
        assert pose_err(poses) < 0.3 * e0
