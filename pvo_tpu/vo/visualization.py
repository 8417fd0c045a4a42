"""Reconstruction visualization & export.

Rebuild of the reference visualizer (VO_Module/droid_slam/
visualization.py) for a headless TPU host: instead of a live Open3D
window in a subprocess, this filters depths by multi-view consistency
(the reference's CUDA depth_filter) and exports point clouds (PLY) and
camera frustums that any viewer can open. The droid_visualization
callback API is kept for parity.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from pvo_tpu.geom.depth_filter import (backproject_points,
                                       depth_consistency_count)


def filtered_pointcloud(video, filter_thresh=0.005, min_count=2,
                        frames=None):
    """Return (points (N,3), colors (N,3) uint8) of consistent pixels.

    Mirrors droid_visualization's masking: count >= min_count and
    disparity above half the mean (visualization.py:55-154).
    """
    t = video.counter
    inds = np.arange(t) if frames is None else np.asarray(frames)

    thresh = filter_thresh * jnp.ones(len(inds)) * \
        jnp.sqrt(jnp.mean(video.disps[inds], axis=(1, 2)))[..., None][..., 0]

    counts = depth_consistency_count(
        video.poses, video.disps, video.intrinsics[0],
        jnp.asarray(inds), thresh)
    points = backproject_points(video.poses, video.disps,
                                video.intrinsics[0], jnp.asarray(inds))

    disps = np.asarray(video.disps[inds])
    masks = (np.asarray(counts) >= min_count) & \
        (disps > 0.5 * disps.mean(axis=(1, 2), keepdims=True))

    imgs = np.asarray(video.images[inds])[:, 3::8, 3::8]
    pts = np.asarray(points)[masks]
    cols = imgs.reshape(masks.shape + (3,))[masks]
    return pts, cols


def write_ply(path, points, colors=None):
    """Minimal binary-free PLY writer (no external deps)."""
    n = len(points)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\n"
                    "property uchar blue\n")
        f.write("end_header\n")
        for i in range(n):
            row = f"{points[i, 0]:.4f} {points[i, 1]:.4f} " \
                  f"{points[i, 2]:.4f}"
            if colors is not None:
                row += f" {int(colors[i, 0])} {int(colors[i, 1])} " \
                       f"{int(colors[i, 2])}"
            f.write(row + "\n")


def droid_visualization(video, out_dir="viz", every=8):
    """Batch export variant of the reference's live loop: dump the
    filtered cloud + trajectory once per call."""
    import os

    from pvo_tpu.lie import se3
    os.makedirs(out_dir, exist_ok=True)
    pts, cols = filtered_pointcloud(video)
    write_ply(os.path.join(out_dir, "cloud.ply"), pts[::every],
              cols[::every])
    traj = np.asarray(se3.matrix(se3.inv(
        video.poses[:video.counter])))[:, :3, 3]
    np.savetxt(os.path.join(out_dir, "trajectory.txt"), traj)
    return pts.shape[0]
