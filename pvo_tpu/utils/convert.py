"""Torch checkpoint -> flax parameter conversion for DroidNet.

The reference ships torch checkpoints
(checkpoints/vkitti2_dy_train_semiv4_080000.pth, see reference
droid.py:52-59 which strips the DDP "module." prefix). This module maps
that state_dict onto our flax trees: conv kernels transpose OIHW->HWIO,
linear weights transpose (out,in)->(in,out); instance/none norms carry
no parameters so the encoders convert conv-for-conv.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _k(w):
    """Conv kernel OIHW -> HWIO."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _conv(sd, tname, out, fname):
    out[fname] = {"Conv_0": {"kernel": _k(sd[f"{tname}.weight"]),
                             "bias": np.asarray(sd[f"{tname}.bias"])}}


def convert_encoder(sd: Dict[str, np.ndarray], prefix: str):
    """Map a torch BasicEncoder subtree (e.g. 'fnet') to flax params."""
    p: Dict = {}
    _conv(sd, f"{prefix}.conv1", p, "conv1")
    _conv(sd, f"{prefix}.conv2", p, "conv2")
    for stage in (1, 2, 3):
        for blk in (0, 1):
            for cv in (1, 2):
                _conv(sd, f"{prefix}.layer{stage}.{blk}.conv{cv}", p,
                      f"_tmp")
                p[f"layer{stage}_{blk}"] = p.get(f"layer{stage}_{blk}",
                                                 {})
                p[f"layer{stage}_{blk}"][f"conv{cv}"] = p.pop("_tmp")
            ds = f"{prefix}.layer{stage}.{blk}.downsample.0.weight"
            if ds in sd:
                p[f"layer{stage}_{blk}"]["downsample"] = {
                    "Conv_0": {
                        "kernel": _k(sd[ds]),
                        "bias": np.asarray(
                            sd[ds.replace("weight", "bias")])}}
    return p


def convert_update(sd: Dict[str, np.ndarray], prefix="update"):
    """Map the torch DynamicUpdateModule subtree to flax params
    (without GraphAgg, which lives separately in our tree)."""
    p: Dict = {}
    _conv(sd, f"{prefix}.corr_encoder.0", p, "corr_enc0")
    _conv(sd, f"{prefix}.corr_encoder.2", p, "corr_enc1")
    _conv(sd, f"{prefix}.flow_encoder.0", p, "flow_enc0")
    _conv(sd, f"{prefix}.flow_encoder.2", p, "flow_enc1")

    for head in ("delta", "delta_dy", "weight", "delta_mask"):
        if f"{prefix}.{head}.0.weight" not in sd:
            continue
        hp: Dict = {}
        _conv(sd, f"{prefix}.{head}.0", hp, "conv0")
        _conv(sd, f"{prefix}.{head}.2", hp, "conv1")
        p[head] = hp

    gru: Dict = {}
    for g in ("convz", "convr", "convq", "w",
              "convz_glo", "convr_glo", "convq_glo"):
        _conv(sd, f"{prefix}.gru.{g}", gru, g)
    p["gru"] = gru

    if f"{prefix}.global_avg_pool.0.weight" in sd:
        _conv(sd, f"{prefix}.global_avg_pool.0", p, "aff_conv")
        p["aff_linear"] = {
            "kernel": np.transpose(
                np.asarray(sd[f"{prefix}.param_linear.0.weight"])),
            "bias": np.asarray(sd[f"{prefix}.param_linear.0.bias"])}
    return p


def convert_agg(sd: Dict[str, np.ndarray], prefix="update.agg"):
    p: Dict = {}
    _conv(sd, f"{prefix}.conv1", p, "conv1")
    _conv(sd, f"{prefix}.conv2", p, "conv2")
    _conv(sd, f"{prefix}.eta.0", p, "eta")
    _conv(sd, f"{prefix}.upmask_disp.0", p, "upmask_disp")
    return p


def convert_droidnet(state_dict) -> Dict:
    """Full torch DroidNet state_dict -> our 4-tree param dict."""
    sd = {k.replace("module.", ""): np.asarray(v)
          for k, v in state_dict.items()}
    return {
        "fnet": {"params": convert_encoder(sd, "fnet")},
        "cnet": {"params": convert_encoder(sd, "cnet")},
        "update": {"params": convert_update(sd, "update")},
        "agg": {"params": convert_agg(sd, "update.agg")},
    }


def load_droidnet_torch(path: str) -> Dict:
    import torch
    sd = torch.load(path, map_location="cpu")
    sd = {k: v.numpy() for k, v in sd.items()}
    return convert_droidnet(sd)
