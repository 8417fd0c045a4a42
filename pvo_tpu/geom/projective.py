"""Pinhole projective geometry with analytic Jacobians, pure JAX.

TPU-native rebuild of the reference's projective ops
(VO_Module/droid_slam/geom/projective_ops.py): inverse projection,
SE3 point action, projection, and the composite ``projective_transform``
that maps pixels of frame ii into frame jj, optionally returning the
(Ji, Jj, Jz) Jacobian blocks consumed by dense bundle adjustment.

Conventions (identical to the reference so BA numerics match):
  * poses are world->camera (w2c) SE3 7-vectors ``[t, q]``
  * depth state is inverse depth ("disparity") at 1/8 resolution
  * homogeneous points are ``[X, Y, 1, d]`` with d = inverse depth
  * tangent layout ``[rho(3), phi(3)]``; Jj is the Jacobian w.r.t. a
    left-multiplied increment on pose jj, Ji = -Adj(Gij)^T-transported
    (reference projective_ops.py:120-127)

Shapes: batched as (B, N, H, W, ...) where N = number of edges.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from pvo_tpu.lie import se3

MIN_DEPTH = 0.2


def coords_grid(ht, wd, dtype=jnp.float32):
    """Pixel coordinate grid, (ht, wd, 2) ordered [x, y]."""
    y, x = jnp.meshgrid(jnp.arange(ht, dtype=dtype),
                        jnp.arange(wd, dtype=dtype), indexing="ij")
    return jnp.stack([x, y], axis=-1)



def gather_disp_rows(disps, ii):
    """``disps[:, ii]`` as an exact one-hot MXU contraction.

    XLA lowers the plain row gather (tens of traced indices from a
    (B, F, H, W) buffer) to a SEQUENTIAL dynamic-slice loop on TPU —
    ~3 ms per linearization at the fused tracking DBA's 144 BA edges
    (scripts/trace_track.py round 3). The one-hot operand has exactly
    one 1.0 per row, so the f32 contraction is bit-exact for FINITE
    buffers. Non-finite values in UNSELECTED rows would pollute every
    output row (0*inf = NaN), unlike a plain gather — callers keep the
    disparity buffer clamped/finite (vo/dba.py retraction clamp), so
    no masking pass is spent here. Integer/bool inputs take the plain
    gather (a 0/1 float contraction can't represent them exactly).
    """
    F = disps.shape[1]
    idx = jnp.asarray(ii)
    if not jnp.issubdtype(disps.dtype, jnp.floating):
        return disps[:, idx]
    oh = (idx[:, None] == jnp.arange(F, dtype=jnp.int32)[None, :]
          ).astype(disps.dtype)
    return jnp.einsum("nf,bf...->bn...", oh, disps)


def iproj(disps, intrinsics):
    """Inverse projection: (B,N,H,W) disps + (B,N,4) intrinsics ->
    homogeneous points (B,N,H,W,4) = [X, Y, 1, d]."""
    ht, wd = disps.shape[-2:]
    fx, fy, cx, cy = jnp.split(intrinsics[..., None, None, :], 4, axis=-1)
    fx, fy = fx[..., 0], fy[..., 0]
    cx, cy = cx[..., 0], cy[..., 0]

    y, x = jnp.meshgrid(jnp.arange(ht, dtype=disps.dtype),
                        jnp.arange(wd, dtype=disps.dtype), indexing="ij")
    X = (x - cx) / fx
    Y = (y - cy) / fy
    ones = jnp.ones_like(disps)
    return jnp.stack([X, Y, ones, disps], axis=-1)


def proj(Xs, intrinsics, jacobian=False, return_depth=False):
    """Pinhole projection of homogeneous points.

    Returns coords (B,N,H,W,2) (or 3 with inverse depth if return_depth)
    and, if jacobian, the 2x4 (or 3x4) projection Jacobian d(coords)/dX.
    """
    fx, fy, cx, cy = jnp.split(intrinsics[..., None, None, :], 4, axis=-1)
    fx, fy = fx[..., 0], fy[..., 0]
    cx, cy = cx[..., 0], cy[..., 0]
    X, Y, Z, D = (Xs[..., 0], Xs[..., 1], Xs[..., 2], Xs[..., 3])

    Z = jnp.where(Z < 0.5 * MIN_DEPTH, jnp.ones_like(Z), Z)
    d = 1.0 / Z

    x = fx * (X * d) + cx
    y = fy * (Y * d) + cy
    if return_depth:
        coords = jnp.stack([x, y, D * d], axis=-1)
    else:
        coords = jnp.stack([x, y], axis=-1)

    if not jacobian:
        return coords, None

    o = jnp.zeros_like(d)
    Jp = jnp.stack([
        fx * d, o, -fx * X * d * d, o,
        o, fy * d, -fy * Y * d * d, o,
    ], axis=-1).reshape(coords.shape[:-1] + (2, 4))
    return coords, Jp


def act_se3(Gij, X0, jacobian=False):
    """Apply relative SE3 (B,N,7) to homogeneous points (B,N,H,W,4).

    If jacobian, also return Ja (B,N,H,W,4,6): the derivative of the
    transformed point w.r.t. a left-increment on Gij (i.e. on pose jj).
    """
    X1 = se3.act4(Gij[:, :, None, None], X0)

    if not jacobian:
        return X1, None

    X, Y, Z, d = (X1[..., 0], X1[..., 1], X1[..., 2], X1[..., 3])
    o = jnp.zeros_like(d)
    Ja = jnp.stack([
        d, o, o, o, Z, -Y,
        o, d, o, -Z, o, X,
        o, o, d, Y, -X, o,
        o, o, o, o, o, o,
    ], axis=-1).reshape(X1.shape[:-1] + (4, 6))
    return X1, Ja


def projective_transform(poses, disps, intrinsics, ii, jj,
                         jacobian=False, return_depth=False,
                         valid_neg=0.0):
    """Map pixels of frames ``ii`` into frames ``jj``.

    Args:
      poses: (B, P, 7) w2c SE3.
      disps: (B, P, H, W) inverse depth.
      intrinsics: (B, P, 4) [fx, fy, cx, cy] at the operating resolution.
      ii, jj: (N,) int frame indices per edge.
    Returns:
      coords (B,N,H,W,2 or 3), valid (B,N,H,W,1), and if jacobian the
      tuple (Ji, Jj, Jz) with shapes (B,N,H,W,2,6), (B,N,H,W,2,6),
      (B,N,H,W,2,1).
    """
    X0 = iproj(gather_disp_rows(disps, ii), intrinsics[:, ii])

    Gij = se3.mul(poses[:, jj], se3.inv(poses[:, ii]))
    X1, Ja = act_se3(Gij, X0, jacobian=jacobian)

    x1, Jp = proj(X1, intrinsics[:, jj], jacobian=jacobian,
                  return_depth=return_depth)

    valid = ((X1[..., 2] > MIN_DEPTH) & (X0[..., 2] > MIN_DEPTH))
    valid = valid.astype(x1.dtype)[..., None]

    if not jacobian:
        return x1, valid

    Jj = jnp.matmul(Jp, Ja)                      # (B,N,H,W,2,6)
    Adj = se3.adj_matrix(Gij)[:, :, None, None]  # (B,N,1,1,6,6)
    Ji = -jnp.matmul(Jj, Adj)                    # rows transported by AdjT

    # dX1/d(disp) = Gij acting on the unit inverse-depth direction:
    # act4 of [0,0,0,1] = [t_ij, 1]
    tij = Gij[..., :3]
    Jz_dir = jnp.concatenate(
        [tij, jnp.ones_like(tij[..., :1])], axis=-1)[:, :, None, None]
    Jz = jnp.matmul(Jp, jnp.broadcast_to(
        Jz_dir[..., None], Jp.shape[:-2] + (4, 1)))

    return x1, valid, (Ji, Jj, Jz)


def projective_jacobian_planes(poses, disps, intrinsics, ii, jj,
                               pose_jac=True):
    """Jacobians of :func:`projective_transform` in PLANE layout.

    ``pose_jac=False`` skips the pose jacobians (Ji_pl/Jj_pl returned
    as None) for depth-only solves where every pose is fixed.

    The stacked per-pixel layout (..., H, W, 2, 6) puts 6 in the lane
    dimension (5% lane use) and composes Jp @ Ja / Jj @ Adj as
    per-pixel micro-matmuls — ~1.2 ms per linearization at tracking
    shapes (scripts/bench_dba.py). Here every jacobian entry is a
    closed-form (B, N, H*W) component plane (full lanes) and only the
    6x6 adjoint transport remains a matmul, with HW on the lane dim.

    Returns:
      coords (B,N,H,W,2), valid (B,N,H,W,1),
      Ji_pl, Jj_pl: (B,N,2,6,HW), Jz_pl: (B,N,2,HW).
    Numerically identical (up to reassociation) to the jacobian=True
    outputs of projective_transform.
    """
    B = disps.shape[0]
    N = jnp.asarray(ii).shape[0]
    H, W = disps.shape[-2:]
    HW = H * W

    X0 = iproj(gather_disp_rows(disps, ii), intrinsics[:, ii])
    Gij = se3.mul(poses[:, jj], se3.inv(poses[:, ii]))
    X1 = se3.act4(Gij[:, :, None, None], X0)

    fx, fy, cx, cy = [intrinsics[:, jj, k][..., None]
                      for k in range(4)]               # (B,N,1)

    Xp = X1[..., 0].reshape(B, N, HW)
    Yp = X1[..., 1].reshape(B, N, HW)
    Zu = X1[..., 2].reshape(B, N, HW)                  # unclamped
    hc = X1[..., 3].reshape(B, N, HW)

    Zc = jnp.where(Zu < 0.5 * MIN_DEPTH, jnp.ones_like(Zu), Zu)
    a = 1.0 / Zc

    x = fx * (Xp * a) + cx
    y = fy * (Yp * a) + cy
    coords = jnp.stack([x, y], axis=-1).reshape(B, N, H, W, 2)

    valid = ((X1[..., 2] > MIN_DEPTH) &
             (X0[..., 2] > MIN_DEPTH)).astype(coords.dtype)[..., None]

    o = jnp.zeros_like(a)
    Xa = Xp * a
    Ya = Yp * a
    if pose_jac:
        aZ = a * Zu  # == 1 except where Z was clamped (invalid pixels)
        # rows of Jp @ Ja expanded symbolically (Jp: proj jacobian, Ja:
        # act_se3 jacobian; see those functions for the factor forms)
        Jj_pl = jnp.stack([
            fx * a * hc, o, -fx * Xa * a * hc,
            -fx * Xa * Ya, fx * (aZ + Xa * Xa), -fx * Ya,
            o, fy * a * hc, -fy * Ya * a * hc,
            -fy * (aZ + Ya * Ya), fy * Xa * Ya, fy * Xa,
        ], axis=2).reshape(B, N, 2, 6, HW)

        # adjoint transport of the rows: Ji = -Jj @ Adj, HW on lanes
        Adj = se3.adj_matrix(Gij)                      # (B,N,6,6)
        Ji_pl = -jnp.einsum("bncdh,bnde->bnceh", Jj_pl, Adj)
    else:
        Ji_pl = Jj_pl = None

    tij = Gij[..., :3]
    t0 = tij[..., 0][..., None]
    t1 = tij[..., 1][..., None]
    t2 = tij[..., 2][..., None]
    Jz_pl = jnp.stack([
        fx * a * (t0 - Xa * t2),
        fy * a * (t1 - Ya * t2),
    ], axis=2)                                          # (B,N,2,HW)

    return coords, valid, Ji_pl, Jj_pl, Jz_pl


def induced_flow(poses, disps, intrinsics, ii, jj):
    """Optical flow induced by camera motion (reference
    projective_ops.py:166-178)."""
    ht, wd = disps.shape[-2:]
    coords0 = coords_grid(ht, wd, dtype=disps.dtype)
    coords1, valid = projective_transform(poses, disps, intrinsics, ii, jj)
    return coords1[..., :2] - coords0, valid


def coords_clamp(coords, h_max, w_max, h_min=0.0, w_min=0.0):
    x = jnp.clip(coords[..., 0], w_min, w_max)
    y = jnp.clip(coords[..., 1], h_min, h_max)
    return jnp.stack([x, y], axis=-1)


def coords_valid(coords, h_max, w_max, h_min=0.0, w_min=0.0, neg_fac=0.1):
    """In-bounds indicator with a soft negative weight outside
    (reference projective_ops.py:187-193)."""
    inb = ((coords[..., 0] < w_max) & (coords[..., 0] >= w_min) &
           (coords[..., 1] < h_max) & (coords[..., 1] >= h_min))
    val = jnp.where(inb, 1.0, neg_fac).astype(coords.dtype)
    return val[..., None]
