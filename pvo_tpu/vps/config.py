"""VPS configuration: yacs-style yaml configs mapped to pvo_tpu.

Rebuild of the reference's config layer (VPS_Module/detectron2/config:
CfgNode/get_cfg with PVO's MODEL.PANOPTIC_FPN.FUSION at
defaults.py:410): a nested-dict config with dotted access, defaults
matching the vkitti Panoptic-FPN yaml configs, yaml merge-from-file,
and a builder producing our model + predictor settings.
"""

from __future__ import annotations

import copy
from typing import Any, Dict


class CfgNode(dict):
    """Minimal yacs-like node: attribute access + merge."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return v

    def __setattr__(self, k, v):
        self[k] = v

    def clone(self):
        return copy.deepcopy(self)

    def merge_from_dict(self, other: Dict[str, Any], prefix=""):
        for k, v in other.items():
            if isinstance(v, dict):
                node = self.setdefault(k, CfgNode())
                if not isinstance(node, CfgNode):
                    node = CfgNode(node)
                    self[k] = node
                node.merge_from_dict(v, prefix + k + ".")
            else:
                self[k] = v

    def merge_from_file(self, path):
        import yaml
        with open(path) as f:
            data = yaml.safe_load(f)
        data.pop("_BASE_", None)
        self.merge_from_dict(data)

    def merge_from_list(self, opts):
        """['MODEL.PANOPTIC_FPN.FUSION', True, ...] overrides."""
        for key, val in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                node = node.setdefault(p, CfgNode())
            node[parts[-1]] = val


def _nest(d):
    out = CfgNode()
    out.merge_from_dict(d)
    return out


def get_cfg() -> CfgNode:
    """Defaults matching the reference's vkitti PanopticFPN configs
    (configs/COCO-PanopticSegmentation/*vkitti*.yaml)."""
    return _nest({
        "MODEL": {
            "META_ARCHITECTURE": "PanopticFPN",
            "WEIGHTS": "",
            "PIXEL_MEAN": [103.530, 116.280, 123.675],
            "PIXEL_STD": [1.0, 1.0, 1.0],
            "MASK_ON": True,
            "RESNETS": {"DEPTH": 50},
            "ROI_HEADS": {"NUM_CLASSES": 3, "SCORE_THRESH_TEST": 0.05,
                          "NMS_THRESH_TEST": 0.5},
            "SEM_SEG_HEAD": {"NUM_CLASSES": 12, "LOSS_WEIGHT": 0.5,
                             "IGNORE_VALUE": 255},
            "PANOPTIC_FPN": {
                "FUSION": False,
                "COMBINE": {"ENABLED": True,
                            "OVERLAP_THRESH": 0.5,
                            "STUFF_AREA_LIMIT": 4096,
                            "INSTANCES_CONFIDENCE_THRESH": 0.5},
            },
            "RPN": {"PRE_NMS_TOPK_TEST": 1000,
                    "POST_NMS_TOPK_TEST": 1000,
                    "NMS_THRESH": 0.7},
        },
        "DATASETS": {"TRAIN": ["vkitti_511_train"],
                     "TEST": ["vkitti_511_val"]},
        "INPUT": {"MIN_SIZE_TEST": 375, "MAX_SIZE_TEST": 1242,
                  "MASK_FORMAT": "bitmask"},
        "SOLVER": {"IMS_PER_BATCH": 8, "BASE_LR": 0.00025,
                   "MAX_ITER": 90000, "CHECKPOINT_PERIOD": 5000},
        "TEST": {"EVAL_PERIOD": 0},
        "OUTPUT_DIR": "./output",
    })


def build_predictor(cfg, image_hw, params=None):
    """cfg -> PanopticPredictor with the cfg's combine thresholds."""
    from .panoptic_fpn import PanopticPredictor

    pred = PanopticPredictor(params=params, image_hw=image_hw)
    comb = cfg.MODEL.PANOPTIC_FPN.COMBINE
    pred.combine_kwargs = {
        "overlap_threshold": comb.OVERLAP_THRESH,
        "stuff_area_thresh": comb.STUFF_AREA_LIMIT,
        "instances_score_thresh": comb.INSTANCES_CONFIDENCE_THRESH,
    }
    return pred
