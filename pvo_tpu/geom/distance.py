"""Mean induced-flow frame distance, pure JAX.

Rebuild of the reference ``frame_distance`` CUDA kernel
(VO_Module/src/droid_kernels.cu:497-639): for each (i, j) pair, the mean
reprojection displacement of frame i's pixels into frame j, blended
between the full relative motion (weight beta) and a translation-only
model (weight 1-beta); pairs where fewer than 75% of pixels land in front
of the camera score 1000.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pvo_tpu.lie import se3

from .projective import MIN_DEPTH, coords_grid, iproj


def frame_distance(poses, disps, intrinsics, ii, jj, beta=0.3):
    """poses (F,7), disps (F,h,w), intrinsics (4,), ii/jj (N,).

    Returns (N,) distances. Matches droid_kernels.cu frame_distance
    (one-directional; callers average both directions for the
    bidirectional metric, depth_video.py:176-186).
    """
    ht, wd = disps.shape[-2:]
    fx, fy, cx, cy = intrinsics

    d_i = disps[ii]  # (N,h,w)
    grid = coords_grid(ht, wd, dtype=disps.dtype)

    Gij = se3.mul(poses[jj], se3.inv(poses[ii]))  # (N,7)

    X0 = iproj(d_i[None], jnp.broadcast_to(intrinsics, (1, len(ii), 4)))[0]

    def flow_dist(Xj):
        Z = Xj[..., 2]
        zsafe = jnp.where(Z < MIN_DEPTH, jnp.ones_like(Z), Z)
        u = fx * Xj[..., 0] / zsafe + cx
        v = fy * Xj[..., 1] / zsafe + cy
        d = jnp.sqrt((u - grid[..., 0]) ** 2 + (v - grid[..., 1]) ** 2)
        valid = (Z > MIN_DEPTH).astype(d.dtype)
        return d * valid, valid

    # full relative motion
    X1 = se3.act4(Gij[:, None, None], X0)
    d_full, v_full = flow_dist(X1)

    # translation-only motion
    tij = Gij[:, None, None, :3]
    X1t = jnp.concatenate(
        [X0[..., :3] + X0[..., 3:4] * tij, X0[..., 3:4]], axis=-1)
    d_trans, v_trans = flow_dist(X1t)

    accum = (beta * jnp.sum(d_full, axis=(-2, -1)) +
             (1 - beta) * jnp.sum(d_trans, axis=(-2, -1)))
    valid = (beta * jnp.sum(v_full, axis=(-2, -1)) +
             (1 - beta) * jnp.sum(v_trans, axis=(-2, -1)))
    total = jnp.full_like(valid, ht * wd)

    frac = valid / (total + 1e-8)
    dist = accum / jnp.maximum(valid, 1e-8)
    return jnp.where(frac < 0.75, 1000.0, dist)


@jax.jit
def frame_distance_bidirectional(poses, disps, intrinsics, ii, jj,
                                 beta=0.3):
    d1 = frame_distance(poses, disps, intrinsics, ii, jj, beta)
    d2 = frame_distance(poses, disps, intrinsics, jj, ii, beta)
    return 0.5 * (d1 + d2)


def window_distance_matrix(poses, disps, intrinsics, d0, WD, beta=0.3):
    """Bidirectional frame-distance matrix over the sliding window
    [d0, d0 + WD) (traced origin, static WD). Rides along the fused
    frontend step so the next frame's proximity-edge proposal needs no
    device round-trip (the reference calls frame_distance on the host
    every frame, droid_frontend.py:45).

    Pair-matrix structure instead of frame_distance on WD*WD flat
    pairs: the back-projected clouds X0 are computed ONCE per window
    frame and broadcast over the pair axis — the flat form gathered
    WD*WD full disparity rows, which XLA lowers as a sequential
    row-loop (~6 ms/frame of the fused step's epilogue at WD=32)."""
    ht, wd = disps.shape[-2:]
    fx, fy, cx, cy = intrinsics
    d0 = jnp.asarray(d0)
    z = jnp.zeros((), d0.dtype)
    pw = jax.lax.dynamic_slice(poses, (d0, z), (WD, 7))
    dw = jax.lax.dynamic_slice(
        disps, (d0, z, z), (WD,) + disps.shape[-2:])

    grid = coords_grid(ht, wd, dtype=disps.dtype)
    X0 = iproj(dw[None], jnp.broadcast_to(intrinsics, (1, WD, 4)))[0]
    # Gij[i, j] = pose[j] * inv(pose[i])  (frame i's cloud into j)
    Gij = se3.mul(pw[None, :], se3.inv(pw)[:, None])      # (WD,WD,7)

    def flow_dist(Xj):
        Z = Xj[..., 2]
        zsafe = jnp.where(Z < MIN_DEPTH, jnp.ones_like(Z), Z)
        u = fx * Xj[..., 0] / zsafe + cx
        v = fy * Xj[..., 1] / zsafe + cy
        d = jnp.sqrt((u - grid[..., 0]) ** 2 + (v - grid[..., 1]) ** 2)
        valid = (Z > MIN_DEPTH).astype(d.dtype)
        return d * valid, valid

    X0b = jnp.broadcast_to(X0[:, None], (WD,) + X0.shape)
    X1 = se3.act4(Gij[:, :, None, None], X0b)
    d_full, v_full = flow_dist(X1)

    tij = Gij[:, :, None, None, :3]
    xyz_t = X0[:, None, ..., :3] + X0[:, None, ..., 3:4] * tij
    X1t = jnp.concatenate(
        [xyz_t, jnp.broadcast_to(X0[:, None, ..., 3:4],
                                 xyz_t.shape[:-1] + (1,))], axis=-1)
    d_trans, v_trans = flow_dist(X1t)

    accum = (beta * jnp.sum(d_full, axis=(-2, -1)) +
             (1 - beta) * jnp.sum(d_trans, axis=(-2, -1)))
    valid = (beta * jnp.sum(v_full, axis=(-2, -1)) +
             (1 - beta) * jnp.sum(v_trans, axis=(-2, -1)))
    frac = valid / (ht * wd + 1e-8)
    dist = accum / jnp.maximum(valid, 1e-8)
    d = jnp.where(frac < 0.75, 1000.0, dist)
    return 0.5 * (d + d.T)
