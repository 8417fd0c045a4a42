"""Offline reconstruction export (reference tools/vis.py, vis_2.py,
vis_ori.py, generate_demo.py): dump trajectory, filtered point cloud,
depth maps, and flow visualizations from a completed VO run for
figures/inspection.
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))



import argparse
import os
import os.path as osp

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--datapath", required=True)
    p.add_argument("--weights", default=None)
    p.add_argument("--out", default="viz")
    p.add_argument("--max_frames", type=int, default=100)
    p.add_argument("--segm_filter", action="store_true")
    args = p.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from pvo_tpu.utils.config import VOConfig
    from pvo_tpu.utils.flow_vis import flow_to_image
    from pvo_tpu.vo.system import VOSystem
    from pvo_tpu.vo.visualization import droid_visualization

    import sys
    sys.path.insert(0, osp.dirname(__file__))
    from test_vo import image_stream

    cfg = VOConfig(segm_filter=args.segm_filter)
    sysm = VOSystem(cfg, weights_path=args.weights)

    for (t, img, intr, segm) in image_stream(
            args.datapath, cfg.image_size, "val", args.segm_filter):
        if t >= args.max_frames:
            break
        sysm.track(t, img, intr, segments=segm)
    sysm.terminate(None, backend_steps=(7,))

    os.makedirs(args.out, exist_ok=True)
    n_pts = droid_visualization(sysm.video, args.out)
    print(f"point cloud: {n_pts} pts -> {args.out}/cloud.ply")

    depth = sysm.get_depth()
    for k in range(0, sysm.video.counter, max(sysm.video.counter // 6,
                                              1)):
        plt.imsave(osp.join(args.out, f"depth_{k:04d}.png"),
                   1.0 / np.maximum(depth[k], 1e-3), cmap="magma")

    flow = np.asarray(sysm.video.full_flow[:sysm.video.counter])
    for k in range(0, len(flow), max(len(flow) // 6, 1)):
        plt.imsave(osp.join(args.out, f"flow_{k:04d}.png"),
                   flow_to_image(flow[k] * 8.0))
    print(f"exports in {args.out}/")


if __name__ == "__main__":
    main()
