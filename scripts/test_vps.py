"""Fused VPS inference + tracking + matching + VPQ (reference
tools/test_vps.sh stages 1-4 in one driver).

Per scene: run Panoptic FPN with flow-guided fusion over the clone 5:1:1
val frames (flow/depth from shared_data), write fused pan_seg PNGs,
propagate instance ids (tracking + matching), and evaluate VPQ over
windows {1, 5, 10, 15, 20} against the GT panoptic maps.
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))



import argparse
import glob
import json
import os
import os.path as osp

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--datapath", required=True)
    p.add_argument("--scene", required=True)
    p.add_argument("--weights", default=None)
    p.add_argument("--shared_data", default="shared_data")
    p.add_argument("--view", default="clone")
    p.add_argument("--use_depth", action="store_true")
    p.add_argument("--tiny", action="store_true",
                   help="1-block backbone, eager apply (CI on CPU)")
    p.add_argument("--scale", type=float, default=1.0,
                   help="downscale factor for inference images")
    args = p.parse_args()

    import cv2
    from PIL import Image

    from pvo_tpu.pipeline.matching import InstanceMatcher
    from pvo_tpu.pipeline.pq import vkitti_categories, vpq_compute
    from pvo_tpu.pipeline.tracking import forward_splat_ids
    from pvo_tpu.utils.io import id2rgb, rgb2id
    from pvo_tpu.vps.panoptic_fpn import PanopticPredictor

    base = osp.join(args.datapath, args.scene, args.view)
    imgs = sorted(glob.glob(osp.join(base,
                                     "frames/rgb/Camera_0/*.jpg")))
    # 5:1:1 validation slice (reference vkitti2.py foo split)
    n = len(imgs)
    val_n = n // 7
    train_n = n - 2 * val_n
    imgs = imgs[train_n:train_n + val_n]

    flow_dir = osp.join(args.shared_data, "full_flow")
    scene = args.scene
    out_dir = osp.join(args.shared_data, "panoptic_segm_fusion",
                       "inference", "pan_seg")
    os.makedirs(out_dir, exist_ok=True)

    predictor = None
    matcher = InstanceMatcher()
    fused_maps, final_maps, seg_infos = [], [], []
    prev_raw = None

    for k, f in enumerate(imgs):
        img = cv2.imread(f)
        if args.scale != 1.0:
            img = cv2.resize(img, None, fx=args.scale, fy=args.scale)
        if predictor is None:
            mk = ({"backbone_blocks": (1, 1, 1, 1)}
                  if args.tiny else None)
            predictor = PanopticPredictor(
                image_hw=img.shape[:2], model_kwargs=mk,
                eager=args.tiny)
        name = osp.basename(f).split(".")[0]
        flow = None
        fp = osp.join(flow_dir, f"{scene}_{name}.npy")
        if k > 0 and osp.exists(fp):
            flow = np.load(fp)
            if args.scale != 1.0:
                flow = cv2.resize(flow, img.shape[:2][::-1]) * args.scale
        pan, segs, _, _ = predictor(img, video_id=scene, flow=flow)

        # id propagation: warp previous fused map, match
        if prev_raw is None or flow is None:
            matcher.reset()
            final = matcher(pan, np.zeros_like(pan))
        else:
            warped = forward_splat_ids(prev_raw, flow)
            final = matcher(pan, warped)
        prev_raw = pan

        fused_maps.append(pan)
        final_maps.append(final)
        seg_infos.append(segs)
        Image.fromarray(id2rgb(final)).save(
            osp.join(out_dir, f"{scene}_{name}.png"))

    # ---- VPQ against GT ----
    gt_dir = osp.join(base, "panoptic_gt_id")
    gts = sorted(glob.glob(osp.join(gt_dir, "*.png")))
    if gts:
        gts = gts[train_n:train_n + val_n]
        gt_maps = [rgb2id(np.array(Image.open(g))) for g in gts]
        if args.scale != 1.0:
            # predictions were made at reduced scale; match GT size
            # with nearest-neighbor id-preserving upsampling
            gh, gw = gt_maps[0].shape
            final_maps = [cv2.resize(m, (gw, gh),
                                     interpolation=cv2.INTER_NEAREST)
                          for m in final_maps]
        gt_segs = []
        for g in gt_maps:
            segs = []
            for sid, area in zip(*np.unique(g, return_counts=True)):
                if sid == 0:
                    continue
                segs.append({"id": int(sid),
                             "category_id": int(sid // 10000),
                             "area": int(area),
                             "iscrowd": 0})
            gt_segs.append(segs)

        pred_segs = []
        for m in final_maps:
            segs = []
            for sid in np.unique(m):
                if sid == 0:
                    continue
                segs.append({"id": int(sid),
                             "category_id": int(sid // 10000)})
            pred_segs.append(segs)

        avg, per_k = vpq_compute(gt_maps, final_maps, gt_segs,
                                 pred_segs, vkitti_categories())
        out = {"scene": scene,
               "vpq_all": avg["All"]["pq"] * 100,
               "vpq_thing": avg["Things"]["pq"] * 100,
               "vpq_stuff": avg["Stuff"]["pq"] * 100}
        print(json.dumps(out))
        vdir = osp.join(args.shared_data, "vpq", scene)
        os.makedirs(vdir, exist_ok=True)
        with open(osp.join(vdir, "vpq-final.txt"), "w") as fh:
            json.dump(out, fh)
    else:
        print("no GT panoptic maps found; wrote predictions only")


if __name__ == "__main__":
    main()
