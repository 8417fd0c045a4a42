"""Detectron2 checkpoint -> flax conversion for Panoptic FPN.

Maps the reference's panFPN checkpoints (detectron2 state_dict naming:
backbone.bottom_up.*, backbone.fpn_lateral*/fpn_output*,
proposal_generator.rpn_head.*, roi_heads.*, sem_seg_head.*, plus the
PVO ``fusion_conv1``) onto pvo_tpu.vps.PanopticFPN parameter trees.
Conv kernels transpose OIHW->HWIO, deconvs IOHW->HWIO, linears
(out,in)->(in,out); FrozenBatchNorm buffers map 1:1.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _k(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _conv(sd, t, use_bias=True):
    out = {"kernel": _k(sd[f"{t}.weight"])}
    if use_bias and f"{t}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{t}.bias"])
    return {"Conv_0": out}


def _frozen_bn(sd, t):
    return {
        "weight": np.asarray(sd[f"{t}.weight"]),
        "bias": np.asarray(sd[f"{t}.bias"]),
        "running_mean": np.asarray(sd[f"{t}.running_mean"]),
        "running_var": np.asarray(sd[f"{t}.running_var"]),
    }


def _dense(sd, t):
    return {"kernel": np.transpose(np.asarray(sd[f"{t}.weight"])),
            "bias": np.asarray(sd[f"{t}.bias"])}


def convert_backbone(sd):
    p: Dict = {}
    bu = "backbone.bottom_up"
    p["stem_conv1"] = _conv(sd, f"{bu}.stem.conv1", use_bias=False)
    p["stem_conv1_norm"] = _frozen_bn(sd, f"{bu}.stem.conv1.norm")
    for stage, n_blocks in zip((2, 3, 4, 5), (3, 4, 6, 3)):
        for b in range(n_blocks):
            base = f"{bu}.res{stage}.{b}"
            blk: Dict = {}
            for cv in (1, 2, 3):
                blk[f"conv{cv}"] = _conv(sd, f"{base}.conv{cv}",
                                         use_bias=False)
                blk[f"conv{cv}_norm"] = _frozen_bn(
                    sd, f"{base}.conv{cv}.norm")
            if f"{base}.shortcut.weight" in sd:
                blk["shortcut"] = _conv(sd, f"{base}.shortcut",
                                        use_bias=False)
                blk["shortcut_norm"] = _frozen_bn(
                    sd, f"{base}.shortcut.norm")
            p[f"res{stage}_{b}"] = blk
    return p


def convert_fpn(sd):
    p: Dict = {}
    for lvl in (2, 3, 4, 5):
        p[f"lateral{lvl}"] = _conv(sd, f"backbone.fpn_lateral{lvl}")
        p[f"output{lvl}"] = _conv(sd, f"backbone.fpn_output{lvl}")
    return p


def convert_rpn(sd):
    base = "proposal_generator.rpn_head"
    return {
        "conv": _conv(sd, f"{base}.conv"),
        "objectness": _conv(sd, f"{base}.objectness_logits"),
        "anchor_deltas": _conv(sd, f"{base}.anchor_deltas"),
    }


def convert_roi_heads(sd):
    bh = {
        "fc1": _dense(sd, "roi_heads.box_head.fc1"),
        "fc2": _dense(sd, "roi_heads.box_head.fc2"),
        "cls_score": _dense(sd, "roi_heads.box_predictor.cls_score"),
        "bbox_pred": _dense(sd, "roi_heads.box_predictor.bbox_pred"),
    }
    mh: Dict = {}
    for i in range(1, 5):
        mh[f"mask_fcn{i}"] = _conv(sd,
                                   f"roi_heads.mask_head.mask_fcn{i}")
    # torch ConvTranspose2d is correlation-style; flax ConvTranspose
    # convolves (spatially flipped kernel) — flip kh/kw on top of the
    # IOHW->HWIO transpose (caught by tests/test_vps_parity.py)
    dk = np.asarray(sd["roi_heads.mask_head.deconv.weight"])
    mh["deconv"] = {"kernel": np.transpose(dk, (2, 3, 0, 1))[::-1, ::-1],
                    "bias": np.asarray(
                        sd["roi_heads.mask_head.deconv.bias"])}
    mh["predictor"] = _conv(sd, "roi_heads.mask_head.predictor")
    return {"box_head": bh, "mask_head": mh}


def convert_semseg(sd):
    p: Dict = {}
    for lvl, k in zip(("p2", "p3", "p4", "p5"), (1, 1, 2, 3)):
        for i in range(k):
            # detectron2 scale heads are Sequential[Conv2d(with .norm),
            # Upsample, Conv2d, Upsample, ...]; convs sit at even idx
            t = f"sem_seg_head.{lvl}.{2 * i}"
            p[f"{lvl}_conv{i}"] = _conv(sd, t, use_bias=False)
            p[f"{lvl}_norm{i}"] = {
                "scale": np.asarray(sd[f"{t}.norm.weight"]),
                "bias": np.asarray(sd[f"{t}.norm.bias"])}
    p["predictor"] = _conv(sd, "sem_seg_head.predictor")
    return p


def convert_panoptic_fpn(state_dict) -> Dict:
    sd = {k.replace("module.", ""): np.asarray(v)
          for k, v in state_dict.items()}
    params = {
        "backbone": convert_backbone(sd),
        "fpn": convert_fpn(sd),
        "rpn_head": convert_rpn(sd),
        "roi_heads": convert_roi_heads(sd),
        "sem_seg_head": convert_semseg(sd),
    }
    if "fusion_conv1.weight" in sd:
        params["fusion_conv1"] = _conv(sd, "fusion_conv1")
    return {"params": params}


def load_panoptic_fpn_torch(path: str) -> Dict:
    import torch
    ckpt = torch.load(path, map_location="cpu")
    if "model" in ckpt:
        ckpt = ckpt["model"]
    sd = {k: (v.numpy() if hasattr(v, "numpy") else v)
          for k, v in ckpt.items()}
    return convert_panoptic_fpn(sd)
