"""Multi-view depth consistency filtering + point back-projection.

Rebuild of the reference CUDA depth_filter / iproj kernels
(VO_Module/src/droid_kernels.cu:640-830): for each target keyframe,
count how many of its 6 temporal neighbors (i-3..i-1, i+1..i+3) observe
a consistent inverse depth (projected depth within ``thresh`` of the
neighbor's own depth map, bilinear-free nearest check like the CUDA
kernel). Used by the visualizer to show only well-supported points.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pvo_tpu.lie import se3

from .projective import MIN_DEPTH, iproj


@functools.partial(jax.jit, static_argnames=())
def depth_consistency_count(poses, disps, intrinsics, inds, thresh):
    """poses (F,7), disps (F,h,w), intrinsics (4,), inds (M,) target
    frames, thresh (M,) per-frame disparity tolerance.

    Returns counts (M, h, w): number of consistent neighbor views.
    """
    F, h, w = disps.shape
    fx, fy, cx, cy = intrinsics
    offsets = jnp.array([-1, -2, -3, 1, 2, 3])

    intr_b = jnp.broadcast_to(intrinsics, (1, len(inds), 4))
    X0 = iproj(disps[inds][None], intr_b)[0]        # (M, h, w, 4)

    def per_neighbor(off):
        jx = jnp.clip(inds + off, 0, F - 1)
        ok_frame = (inds + off >= 0) & (inds + off < F)

        Gij = se3.mul(poses[jx], se3.inv(poses[inds]))
        X1 = se3.act4(Gij[:, None, None], X0)
        Z = X1[..., 2]
        zsafe = jnp.where(Z < MIN_DEPTH, 1.0, Z)
        u = fx * X1[..., 0] / zsafe + cx
        v = fy * X1[..., 1] / zsafe + cy
        d_proj = X1[..., 3] / zsafe                  # inverse depth in j

        ui = jnp.round(u).astype(jnp.int32)
        vi = jnp.round(v).astype(jnp.int32)
        inb = ((ui >= 0) & (ui < w) & (vi >= 0) & (vi < h) &
               (Z > MIN_DEPTH))
        uc = jnp.clip(ui, 0, w - 1)
        vc = jnp.clip(vi, 0, h - 1)
        d_obs = jax.vmap(lambda dj, vv, uu: dj[vv, uu])(
            disps[jx], vc, uc)
        consistent = (jnp.abs(d_proj - d_obs) < thresh[:, None, None])
        return (consistent & inb &
                ok_frame[:, None, None]).astype(jnp.float32)

    counts = jnp.sum(jax.vmap(per_neighbor)(offsets), axis=0)
    return counts


def backproject_points(poses, disps, intrinsics, inds):
    """Camera-frame points -> world points for the given frames
    (reference iproj_kernel). Returns (M, h, w, 3) world points."""
    intr_b = jnp.broadcast_to(intrinsics, (1, len(inds), 4))
    X0 = iproj(disps[inds][None], intr_b)[0]
    d = jnp.maximum(X0[..., 3:4], 1e-6)
    pts_cam = X0[..., :3] / d
    Ginv = se3.inv(poses[inds])
    return se3.act(Ginv[:, None, None], pts_cam)
