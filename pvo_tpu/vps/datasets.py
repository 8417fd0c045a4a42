"""VPS dataset registration + video pair mapping.

Rebuild of the reference's dataset plumbing (VPS_Module/detectron2/data/
datasets/others.py:13-259 and PanopticFPN_video_DatasetMapper.py): a
minimal DatasetCatalog with the vkitti registrations (clone 5:1:1 val,
clone full, 15-deg-left test) and a mapper producing {ref, cur} frame
pairs with flow (and optional depth) for fusion training/inference.
"""

from __future__ import annotations

import glob
import json
import os.path as osp
from typing import Callable, Dict, List

import numpy as np

from .categories import VKITTI_CATEGORIES

_CATALOG: Dict[str, Callable[[], List[dict]]] = {}
_METADATA: Dict[str, dict] = {}


def register(name, loader, metadata=None):
    _CATALOG[name] = loader
    _METADATA[name] = metadata or {}


def get(name):
    return _CATALOG[name]()


def metadata(name):
    return _METADATA[name]


def list_datasets():
    return sorted(_CATALOG)


def vkitti_metadata():
    thing_ids = [c["trainId"] for c in VKITTI_CATEGORIES
                 if c["isthing"] == 1]
    stuff_ids = [c["trainId"] for c in VKITTI_CATEGORIES
                 if c["isthing"] == 0]
    return {
        "thing_dataset_id_to_contiguous_id":
            {k: i for i, k in enumerate(thing_ids)},
        "stuff_dataset_id_to_contiguous_id":
            {k: i + 1 for i, k in enumerate(stuff_ids)},
        "thing_classes": [c["name"] for c in VKITTI_CATEGORIES
                          if c["isthing"] == 1],
        "stuff_classes": [c["name"] for c in VKITTI_CATEGORIES
                          if c["isthing"] == 0],
    }


def load_vkitti_annotation(root, scenes, view, split=None,
                           flow_dir=None, depth_dir=None):
    """Build per-frame records; with flow_dir also attach the previous
    frame as ``ref`` + the flow file (the video pair mapper contract)."""
    records = []
    for scene in scenes:
        base = osp.join(root, scene, view)
        imgs = sorted(glob.glob(osp.join(base,
                                         "frames/rgb/Camera_0/*.jpg")))
        sems = sorted(glob.glob(osp.join(base,
                                         "stuff_labelTrainIds/*.png")))
        pan_json = osp.join(base, "panoptic_gt.json")
        annos = None
        if osp.exists(pan_json):
            with open(pan_json) as f:
                annos = json.load(f)["annotations"]

        idxs = range(len(imgs))
        if split is not None:
            split_file = osp.join(base, "split_511.json")
            if osp.exists(split_file):
                with open(split_file) as f:
                    idxs = json.load(f)[split]

        for k in idxs:
            name = osp.splitext(osp.basename(imgs[k]))[0]
            pan_png = osp.join(base, "panoptic_gt_id", name + ".png")
            rec = {
                "image_id": f"{scene}_{name}",
                "file_name": imgs[k],
                "scene": scene,
                "frame_index": int(k),
                "sem_seg_file_name": sems[k] if k < len(sems) else None,
                "pan_seg_file_name": (pan_png if osp.exists(pan_png)
                                      else None),
                "segments_info": (annos[k]["segments_info"]
                                  if annos else None),
            }
            if flow_dir is not None and k > 0:
                rec["ref_file_name"] = imgs[k - 1]
                rec["flow_file_name"] = osp.join(
                    flow_dir, f"{scene}_{name}.npy")
            if depth_dir is not None and k > 0:
                rec["depth_file_name"] = osp.join(
                    depth_dir, f"{scene}_{name}.npy")
            records.append(rec)
    return records


def register_vkitti(root, shared_data="shared_data"):
    """The three registrations of the reference (others.py:175-259)."""
    scenes = ["Scene01", "Scene02", "Scene06", "Scene18", "Scene20"]
    meta = vkitti_metadata()
    register("vkitti_511_val",
             lambda: load_vkitti_annotation(
                 root, scenes, "clone", split="val",
                 flow_dir=osp.join(shared_data, "full_flow")),
             meta)
    register("vkitti_511_train",
             lambda: load_vkitti_annotation(
                 root, scenes, "clone", split="train",
                 flow_dir=osp.join(shared_data, "full_flow")),
             meta)
    register("vkitti_clone",
             lambda: load_vkitti_annotation(root, scenes, "clone"),
             meta)
    register("vkitti_test",
             lambda: load_vkitti_annotation(root, scenes,
                                            "15-deg-left"),
             meta)


def video_pair_mapper(record, load_depth=False):
    """Materialize one {ref, cur} training/eval sample (reference
    PanopticFPN_video_DatasetMapper.py:22-150)."""
    import cv2

    out = {"image": cv2.imread(record["file_name"])}  # BGR
    if record.get("sem_seg_file_name"):
        out["sem_seg"] = cv2.imread(record["sem_seg_file_name"],
                                    cv2.IMREAD_GRAYSCALE)
    if record.get("ref_file_name"):
        out["ref_image"] = cv2.imread(record["ref_file_name"])
        if osp.exists(record.get("flow_file_name", "")):
            out["flow"] = np.load(record["flow_file_name"])
        if load_depth and osp.exists(record.get("depth_file_name", "")):
            out["depth"] = np.load(record["depth_file_name"]) / 100.0
    out["segments_info"] = record.get("segments_info")
    return out


def instance_targets(record, image_hw, max_instances=32):
    """Build padded, static-shape instance GT for the training losses
    (the role of detectron2's annotations_to_instances inside the
    dataset mapper, reference PanopticFPN_video_DatasetMapper.py:94-118):
    thing segments from the panoptic_gt_id PNG become bitmasks, tight
    boxes, and contiguous class ids, padded to max_instances.

    Returns dict(gt_boxes (M,4) f32, gt_classes (M,) i32,
    gt_valid (M,) bool, gt_masks (M,H,W) f32).
    """
    import cv2

    from pvo_tpu.utils.io import rgb2id

    H, W = image_hw
    meta = vkitti_metadata()
    thing_map = meta["thing_dataset_id_to_contiguous_id"]

    boxes = np.zeros((max_instances, 4), np.float32)
    classes = np.zeros((max_instances,), np.int32)
    valid = np.zeros((max_instances,), bool)
    masks = np.zeros((max_instances, H, W), np.float32)

    segs = record.get("segments_info")
    pan_file = record.get("pan_seg_file_name")
    if segs and pan_file:
        pan = rgb2id(cv2.imread(pan_file)[:, :, ::-1])
        if pan.shape != (H, W):
            pan = cv2.resize(pan.astype(np.int32), (W, H),
                             interpolation=cv2.INTER_NEAREST)
        n = 0
        for seg in segs:
            cat = seg.get("category_id")
            if cat not in thing_map or n >= max_instances:
                continue
            m = pan == seg["id"]
            ys, xs = np.nonzero(m)
            if ys.size == 0:
                continue
            boxes[n] = (xs.min(), ys.min(), xs.max() + 1.0,
                        ys.max() + 1.0)
            classes[n] = thing_map[cat]
            valid[n] = True
            masks[n] = m
            n += 1
    return {"gt_boxes": boxes, "gt_classes": classes,
            "gt_valid": valid, "gt_masks": masks}


def train_sample_mapper(record, max_instances=32, load_depth=False):
    """Full training sample: image + semseg labels + padded instance
    targets (+ ref/flow when present, for fusion finetune)."""
    out = video_pair_mapper(record, load_depth=load_depth)
    img = out["image"]
    H, W = img.shape[:2]
    sem = out.get("sem_seg")
    if sem is None:
        sem = np.full((H, W), 255, np.uint8)
    sample = {
        "image": img[None].astype(np.float32),
        "sem_labels": sem[None].astype(np.int32),
        **instance_targets(record, (H, W), max_instances),
    }
    if "ref_image" in out:
        sample["ref_image"] = out["ref_image"][None].astype(np.float32)
    if "flow" in out:
        sample["flow"] = out["flow"].astype(np.float32)
    return sample
