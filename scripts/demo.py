"""Generic image-directory VO demo (reference VO_Module/demo.py).

Runs the VO system over a directory of images with a calibration file,
prints the trajectory, and optionally dumps a filtered point cloud.
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))



import argparse
import glob
import os.path as osp

import numpy as np


def image_stream(imagedir, calib, stride=1):
    import cv2

    calib = np.loadtxt(calib, delimiter=" ")
    fx, fy, cx, cy = calib[:4]
    files = sorted(glob.glob(osp.join(imagedir, "*.png")) +
                   glob.glob(osp.join(imagedir, "*.jpg")))[::stride]
    for t, f in enumerate(files):
        img = cv2.imread(f)
        if len(calib) > 4:
            K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])
            img = cv2.undistort(img, K, calib[4:])
        h0, w0 = img.shape[:2]
        h1 = int(h0 * np.sqrt((384 * 512) / (h0 * w0)))
        w1 = int(w0 * np.sqrt((384 * 512) / (h0 * w0)))
        img = cv2.resize(img, (w1, h1))
        img = img[: h1 - h1 % 8, : w1 - w1 % 8]
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        intr = np.array([fx, fy, cx, cy]) * \
            np.array([w1 / w0, h1 / h0, w1 / w0, h1 / h0])
        yield t, img, intr.astype(np.float32), None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--imagedir", required=True)
    p.add_argument("--calib", required=True)
    p.add_argument("--weights", default=None)
    p.add_argument("--stride", type=int, default=3)
    p.add_argument("--buffer", type=int, default=512)
    p.add_argument("--vis", action="store_true")
    p.add_argument("--live", type=int, default=0, metavar="PORT",
                   help="serve the live HTTP viewer on this port "
                        "(refreshed every --live_every keyframes)")
    p.add_argument("--live_every", type=int, default=8)
    args = p.parse_args()

    frames = list(image_stream(args.imagedir, args.calib, args.stride))
    H, W = frames[0][1].shape[:2]

    from pvo_tpu.utils.config import VOConfig
    from pvo_tpu.vo.system import VOSystem

    cfg = VOConfig(image_size=(H, W), buffer=args.buffer)
    sysm = VOSystem(cfg, weights_path=args.weights)

    viewer = None
    if args.live:
        from pvo_tpu.vo.live_viewer import LiveViewer
        viewer = LiveViewer(sysm.video, port=args.live)
        print(f"live viewer: http://127.0.0.1:{viewer.port}/")

    for i, (t, img, intr, _) in enumerate(frames):
        sysm.track(t, img, intr)
        if viewer is not None and i % args.live_every == 0:
            if sysm.planner.engaged:
                # under planner mode a mid-stream readback would
                # stall the device-resident pipeline — surface the
                # freeze in the HUD instead of refreshing
                viewer.mark_stale()
            else:
                viewer.update()

    traj = sysm.terminate(iter(frames))
    np.savetxt("demo_traj.txt", traj)
    print(f"wrote demo_traj.txt ({len(traj)} poses, "
          f"{sysm.video.counter} keyframes)")

    if viewer is not None:
        viewer.update()   # final state incl. global-BA poses

    if args.vis:
        from pvo_tpu.vo.visualization import droid_visualization
        n = droid_visualization(sysm.video)
        print(f"wrote viz/cloud.ply ({n} points)")

    if viewer is not None:
        # the HTTP server is a daemon thread; without a hold the
        # process would exit and the final refresh would be served
        # for ~0 seconds (round-4 advisor finding)
        try:
            input("live viewer holding final state — press Enter "
                  "to exit")
        except EOFError:
            pass


if __name__ == "__main__":
    main()
