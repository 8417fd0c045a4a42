"""Virtual KITTI 2 dataset preparation (reference tools/datasets/
1_generate_image_info.py + 2_generate_json.py + CATEGORY.py).

From the raw vkitti classSegmentation / instanceSegmentation PNGs,
produce per scene+view:
  * panoptic_gt_id/  — id2rgb PNGs with the cat*10000+instance scheme
  * stuff_labelTrainIds/ — semantic trainId maps
  * panoptic_gt.json — COCO-panoptic-style annotations
  * split_511.json   — the 5:1:1 train/val/test frame split
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

# vkitti class colors -> our trainIds (reference CATEGORY.py)
CLASS_COLORS = {
    (210, 0, 200): 1,    # Terrain
    (90, 200, 255): 2,   # Sky
    (0, 199, 0): 3,      # Tree
    (90, 240, 0): 4,     # Vegetation
    (140, 140, 140): 5,  # Building
    (100, 60, 100): 6,   # Road
    (250, 100, 255): 7,  # GuardRail
    (255, 255, 0): 8,    # TrafficSign
    (200, 200, 0): 9,    # TrafficLight
    (255, 130, 0): 10,   # Pole
    (80, 80, 80): 11,    # Misc
    (160, 60, 60): 12,   # Truck
    (255, 127, 80): 13,  # Car
    (0, 139, 139): 14,   # Van
}
THING_IDS = {12, 13, 14}


def class_map_from_colors(img):
    out = np.zeros(img.shape[:2], np.int32)
    for color, tid in CLASS_COLORS.items():
        m = np.all(img == np.asarray(color), axis=-1)
        out[m] = tid
    return out


def build_panoptic_id(class_map, instance_map):
    """cat*10000 (+ instance id + 1 for things)."""
    pan = class_map.astype(np.int64) * 10000
    thing = np.isin(class_map, list(THING_IDS))
    pan = np.where(thing, pan + instance_map.astype(np.int64) + 1, pan)
    pan[class_map == 0] = 0
    return pan


def prepare_view(base, out_base=None):
    import cv2
    from PIL import Image

    from pvo_tpu.utils.io import id2rgb

    out_base = out_base or base
    cls_files = sorted(glob.glob(osp.join(
        base, "frames/classSegmentation/Camera_0/*.png")))
    inst_files = sorted(glob.glob(osp.join(
        base, "frames/instanceSegmentation/Camera_0/*.png")))
    if not cls_files:
        return 0

    pan_dir = osp.join(out_base, "panoptic_gt_id")
    sem_dir = osp.join(out_base, "stuff_labelTrainIds")
    os.makedirs(pan_dir, exist_ok=True)
    os.makedirs(sem_dir, exist_ok=True)

    images, annotations = [], []
    for k, cf in enumerate(cls_files):
        cimg = cv2.cvtColor(cv2.imread(cf), cv2.COLOR_BGR2RGB)
        cmap = class_map_from_colors(cimg)
        if k < len(inst_files):
            iimg = cv2.imread(inst_files[k], cv2.IMREAD_ANYDEPTH |
                              cv2.IMREAD_ANYCOLOR)
            if iimg is None:
                iimg = np.zeros(cmap.shape, np.int32)
            elif iimg.ndim == 3:
                iimg = iimg[..., 0].astype(np.int32)
        else:
            iimg = np.zeros(cmap.shape, np.int32)

        pan = build_panoptic_id(cmap, iimg)
        name = osp.basename(cf).replace("classgt_", "pan_")
        Image.fromarray(id2rgb(pan)).save(osp.join(pan_dir, name))
        Image.fromarray(cmap.astype(np.uint8)).save(
            osp.join(sem_dir, name))

        h, w = pan.shape
        images.append({"id": k, "file_name": name,
                       "height": h, "width": w})
        segs = []
        for sid in np.unique(pan):
            if sid == 0:
                continue
            segs.append({"id": int(sid),
                         "category_id": int(sid // 10000),
                         "area": int((pan == sid).sum()),
                         "iscrowd": 0})
        annotations.append({"image_id": k, "file_name": name,
                            "segments_info": segs})

    with open(osp.join(out_base, "panoptic_gt.json"), "w") as f:
        json.dump({"images": images, "annotations": annotations}, f)

    # 5:1:1 split (reference vkitti2.py foo slice)
    n = len(cls_files)
    val_n = n // 7
    train_n = n - 2 * val_n
    with open(osp.join(out_base, "split_511.json"), "w") as f:
        json.dump({
            "train": list(range(0, train_n)),
            "val": list(range(train_n, train_n + val_n)),
            "test": list(range(train_n + val_n, n)),
        }, f)
    return len(cls_files)


def generate_dynamic_masks(base, thresh=0.5):
    """GT dynamic masks from flow/pose consistency (reference
    tools/datasets/generate_dynamic_masks.py): static where the GT flow
    agrees with the camera-induced flow."""
    import cv2

    from pvo_tpu.utils.io import (VKITTI_INTRINSICS, decode_vkitti_depth,
                                  decode_vkitti_flow, vkitti_poses_tq)
    import jax.numpy as jnp

    from pvo_tpu.geom import projective

    flows = sorted(glob.glob(osp.join(
        base, "frames/forwardFlow/Camera_0/*.png")))
    depths = sorted(glob.glob(osp.join(
        base, "frames/depth/Camera_0/*.png")))
    if not flows:
        return 0
    poses = vkitti_poses_tq(osp.join(base, "extrinsic.txt"))
    out_dir = osp.join(base, "frames/dynamicMask/Camera_0")
    os.makedirs(out_dir, exist_ok=True)

    for k in range(len(flows)):
        raw = cv2.imread(flows[k], cv2.IMREAD_ANYCOLOR |
                         cv2.IMREAD_ANYDEPTH)
        gt_flow, gt_val = decode_vkitti_flow(raw)
        depth = decode_vkitti_depth(cv2.imread(
            depths[k], cv2.IMREAD_ANYCOLOR | cv2.IMREAD_ANYDEPTH))
        disp = 1.0 / np.maximum(depth, 1e-3)

        cam_flow, valid = projective.induced_flow(
            jnp.asarray(poses[k:k + 2])[None],
            jnp.asarray(disp)[None, None].repeat(2, 1),
            jnp.broadcast_to(jnp.asarray(VKITTI_INTRINSICS),
                             (1, 2, 4)),
            np.array([0]), np.array([1]))
        d = np.linalg.norm(np.asarray(cam_flow)[0, 0] - gt_flow,
                           axis=-1)
        static = (d <= thresh).astype(np.float32)
        val = (gt_val * np.asarray(valid)[0, 0, :, :, 0]).astype(
            np.float32)
        np.save(osp.join(out_dir, f"dymask_{k:05d}.npy"),
                np.stack([static, val], axis=-1))
    return len(flows)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--datapath", required=True)
    p.add_argument("--scenes", nargs="+",
                   default=["Scene01", "Scene02", "Scene06",
                            "Scene18", "Scene20"])
    p.add_argument("--views", nargs="+",
                   default=["clone", "15-deg-left"])
    p.add_argument("--dynamic_masks", action="store_true")
    args = p.parse_args()

    for scene in args.scenes:
        for view in args.views:
            base = osp.join(args.datapath, scene, view)
            n = prepare_view(base)
            print(f"{scene}/{view}: {n} frames prepared")
            if args.dynamic_masks:
                m = generate_dynamic_masks(base)
                print(f"{scene}/{view}: {m} dynamic masks")


if __name__ == "__main__":
    main()
