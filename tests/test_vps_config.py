"""Config layer tests."""

import os

from pvo_tpu.vps.config import CfgNode, get_cfg


def test_defaults():
    cfg = get_cfg()
    assert cfg.MODEL.PANOPTIC_FPN.FUSION is False
    assert cfg.MODEL.ROI_HEADS.NUM_CLASSES == 3
    assert cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES == 12


def test_merge_from_list():
    cfg = get_cfg()
    cfg.merge_from_list(["MODEL.PANOPTIC_FPN.FUSION", True,
                         "SOLVER.BASE_LR", 1e-3])
    assert cfg.MODEL.PANOPTIC_FPN.FUSION is True
    assert cfg.SOLVER.BASE_LR == 1e-3


def test_merge_from_yaml(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text(
        "MODEL:\n  PANOPTIC_FPN:\n    FUSION: true\n"
        "INPUT:\n  MIN_SIZE_TEST: 240\n")
    cfg = get_cfg()
    cfg.merge_from_file(str(p))
    assert cfg.MODEL.PANOPTIC_FPN.FUSION is True
    assert cfg.INPUT.MIN_SIZE_TEST == 240
    # untouched defaults survive the merge
    assert cfg.MODEL.ROI_HEADS.NUM_CLASSES == 3


def test_clone_independent():
    a = get_cfg()
    b = a.clone()
    b.MODEL.PANOPTIC_FPN.FUSION = True
    assert a.MODEL.PANOPTIC_FPN.FUSION is False
