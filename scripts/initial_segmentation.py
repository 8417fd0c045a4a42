"""Initial (fusion-free) panoptic segmentation over vkitti scenes.

Reference: tools/initial_segmentation.sh + tools/split_init_segm.py —
runs Panoptic FPN in plain mode over the clone and 15-deg-left views and
writes per-scene id2rgb PNGs into datasets/.../panFPN_segm/ for the VO
segment filter.
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))



import argparse
import glob
import os
import os.path as osp

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--datapath", required=True,
                   help="Virtual_KITTI2 root")
    p.add_argument("--weights", default=None)
    p.add_argument("--scenes", nargs="+",
                   default=["Scene01", "Scene02", "Scene06", "Scene18",
                            "Scene20"])
    p.add_argument("--views", nargs="+",
                   default=["clone", "15-deg-left"])
    p.add_argument("--tiny", action="store_true",
                   help="1-block backbone, eager apply (CI on CPU)")
    p.add_argument("--scale", type=float, default=1.0,
                   help="downscale factor for inference images")
    args = p.parse_args()

    import cv2
    from PIL import Image

    from pvo_tpu.utils.io import id2rgb
    from pvo_tpu.vps.panoptic_fpn import PanopticPredictor

    predictor = None
    for scene in args.scenes:
        for view in args.views:
            imgs = sorted(glob.glob(osp.join(
                args.datapath, scene, view,
                "frames/rgb/Camera_0/*.jpg")))
            if not imgs:
                continue
            out_dir = osp.join(args.datapath, scene, view,
                               "panFPN_segm")
            os.makedirs(out_dir, exist_ok=True)
            for f in imgs:
                img = cv2.imread(f)  # BGR like detectron2 input
                if args.scale != 1.0:
                    img = cv2.resize(img, None, fx=args.scale,
                                     fy=args.scale)
                if predictor is None:
                    mk = ({"backbone_blocks": (1, 1, 1, 1)}
                          if args.tiny else None)
                    predictor = PanopticPredictor(
                        image_hw=img.shape[:2], model_kwargs=mk,
                        eager=args.tiny)
                pan, _, _, _ = predictor(img)
                name = osp.basename(f).replace(".jpg", ".png")
                Image.fromarray(id2rgb(pan)).save(
                    osp.join(out_dir, name))
            print(f"{scene}/{view}: {len(imgs)} frames")


if __name__ == "__main__":
    main()
