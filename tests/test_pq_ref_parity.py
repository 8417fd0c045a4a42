"""Cross-validate pipeline/pq.py against the reference's OWN runnable
numpy eval tools on identical inputs.

The reference PQ (VPS_Module/detectron2/evaluation/pq_compute.py:73-165,
trainId-keyed single-core path) and tube VPQ
(VPS_Module/tools/4_eval_vpq.py:76-217 vpq_compute_single_core) are pure
numpy and run in this environment once their panopticapi import is
stubbed. Any metric drift between our implementation and theirs fails
these tests — the VPQ parity claim depends on the metric itself being
provably equal.
"""

import importlib.util
import json
import os
import sys
import types

import numpy as np
import pytest

from pvo_tpu.pipeline import pq as ours

REF_PQ = "/root/reference/VPS_Module/detectron2/evaluation/pq_compute.py"
REF_VPQ = "/root/reference/VPS_Module/tools/4_eval_vpq.py"


def _rgb2id(color):
    color = color.astype(np.uint32)
    return (color[..., 0] + 256 * color[..., 1] +
            256 * 256 * color[..., 2])


def _id2rgb(id_map):
    rgb = np.zeros(id_map.shape + (3,), np.uint8)
    v = id_map.astype(np.uint32)
    for i in range(3):
        rgb[..., i] = v % 256
        v = v // 256
    return rgb


def _load_ref(path, name):
    """Import a reference eval module with panopticapi stubbed."""
    if "panopticapi" not in sys.modules:
        pkg = types.ModuleType("panopticapi")
        utils = types.ModuleType("panopticapi.utils")
        utils.rgb2id = _rgb2id
        utils.id2rgb = _id2rgb
        utils.get_traceback = lambda f: f
        pkg.utils = utils
        sys.modules["panopticapi"] = pkg
        sys.modules["panopticapi.utils"] = utils
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _synth_video(T=24, H=40, W=60, seed=0, with_crowd=True):
    """A synthetic panoptic video with moving things, id switches,
    births/deaths, VOID regions and (optionally) one crowd GT segment.
    Ids use the vkitti scheme cat*10000(+instance)."""
    rng = np.random.RandomState(seed)
    cats = ours.vkitti_categories()
    stuff = [c for c, v in cats.items() if not v["isthing"]][:3]
    things = [c for c, v in cats.items() if v["isthing"]]

    gt_maps, pred_maps = [], []
    gt_segs, pred_segs = [], []
    for t in range(T):
        gt = np.zeros((H, W), np.int64)
        # stuff bands (stable), with a VOID stripe at the top
        gt[4:18] = stuff[0] * 10000
        gt[18:30] = stuff[1] * 10000
        gt[30:] = stuff[2] * 10000
        # two moving things; thing 2 is born at t=6 and switches
        # nothing in GT
        x1 = 5 + t
        gt[8:16, x1:x1 + 10] = things[0] * 10000 + 1
        if t >= 6:
            x2 = 40 - t // 2
            gt[22:34, x2:x2 + 12] = things[1] * 10000 + 2
        if with_crowd and t % 5 == 0:
            gt[0:4, 0:20] = things[0] * 10000 + 9  # crowd region

        # prediction: same scene with jitter, an id switch at t=12,
        # an occasional spurious segment, and a missed detection
        pred = np.zeros((H, W), np.int64)
        pred[4 + rng.randint(-1, 2):18] = stuff[0] * 10000
        pred[18:30] = stuff[1] * 10000
        pred[30:] = stuff[2] * 10000
        if t != 9:  # missed at t=9
            inst = 1 if t < 12 else 5  # id switch
            dx = rng.randint(-1, 2)
            pred[8:16, x1 + dx:x1 + dx + 10] = things[0] * 10000 + inst
        if t >= 6:
            x2 = 40 - t // 2
            pred[22:34, x2:x2 + 12] = things[1] * 10000 + 2
        if t % 7 == 3:  # spurious
            pred[1:4, 40:55] = things[2] * 10000 + 8

        def segs_of(m, crowd_id=None):
            out = []
            for sid, area in zip(*np.unique(m, return_counts=True)):
                if sid == 0:
                    continue
                out.append({"id": int(sid),
                            "category_id": int(sid) // 10000,
                            "area": int(area),
                            "iscrowd": int(sid == crowd_id)})
            return out

        crowd_id = (things[0] * 10000 + 9) if with_crowd else None
        gt_maps.append(gt)
        pred_maps.append(pred)
        gt_segs.append(segs_of(gt, crowd_id))
        pred_segs.append(segs_of(pred))
    return gt_maps, pred_maps, gt_segs, pred_segs


def _ref_categories():
    cats = ours.vkitti_categories()
    return {c: {"name": v["name"], "isthing": int(v["isthing"])}
            for c, v in cats.items()}


def _stat_dict(ref_stat):
    return {c: (s.tp, s.fp, s.fn, s.iou)
            for c, s in ref_stat.pq_per_cat.items()
            if (s.tp, s.fp, s.fn) != (0, 0, 0) or s.iou != 0.0}


def _our_stat_dict(stat):
    return {c: (s.tp, s.fp, s.fn, s.iou)
            for c, s in stat.per_cat.items()
            if (s.tp, s.fp, s.fn) != (0, 0, 0) or s.iou != 0.0}


def test_pq_matches_reference_tool(tmp_path):
    """pipeline.pq.pq_compute == the reference pq_compute_single_core
    on identical PNG/json inputs."""
    PIL = pytest.importorskip("PIL.Image")
    ref = _load_ref(REF_PQ, "ref_pq_compute")
    gt_maps, pred_maps, gt_segs, pred_segs = _synth_video()

    gt_dir = tmp_path / "gt"
    pred_dir = tmp_path / "pred"
    os.makedirs(gt_dir)
    os.makedirs(pred_dir)
    ann_set = []
    for t, (g, p) in enumerate(zip(gt_maps, pred_maps)):
        fn = f"{t:06d}.png"
        PIL.fromarray(_id2rgb(g)).save(gt_dir / fn)
        PIL.fromarray(_id2rgb(p)).save(pred_dir / fn)
        ann_set.append((
            {"image_id": t, "file_name": fn,
             "segments_info": json.loads(json.dumps(gt_segs[t]))},
            {"image_id": t, "file_name": fn,
             "segments_info": json.loads(json.dumps(pred_segs[t]))},
        ))

    cats = _ref_categories()
    ref_stat = ref.pq_compute_single_core(
        0, ann_set, str(gt_dir), str(pred_dir), cats)

    our_res, our_stat = ours.pq_compute(
        gt_maps, pred_maps, gt_segs, pred_segs, ours.vkitti_categories())

    assert _stat_dict(ref_stat) == pytest.approx(_our_stat_dict(our_stat))
    for name, isthing in (("All", None), ("Things", True),
                          ("Stuff", False)):
        ref_avg, _ = ref_stat.pq_average(cats, isthing=isthing)
        for m in ("pq", "sq", "rq", "n"):
            assert our_res[name][m] == pytest.approx(ref_avg[m]), (
                name, m)


@pytest.mark.parametrize("k", [1, 5, 10, 15, 20])
def test_vpq_matches_reference_tool(k):
    """pipeline.pq.vpq_compute's per-window stats == the reference
    vpq_compute_single_core for every window size k."""
    ref = _load_ref(REF_VPQ, "ref_eval_vpq")
    gt_maps, pred_maps, gt_segs, pred_segs = _synth_video()

    gt_pred_set = []
    for t, (g, p) in enumerate(zip(gt_maps, pred_maps)):
        gt_pred_set.append((
            {"segments_info": json.loads(json.dumps(gt_segs[t]))},
            {"segments_info": json.loads(json.dumps(pred_segs[t]))},
            _id2rgb(g), _id2rgb(p), {"id": t},
        ))
    cats = _ref_categories()
    ref_stat = ref.vpq_compute_single_core(gt_pred_set, cats, nframes=k)

    stat = ours.PQStat()
    for idx in range(0, len(gt_maps) - k + 1):
        sl = slice(idx, idx + k)
        stat += ours.tube_pq_stat(gt_maps[sl], pred_maps[sl],
                                  gt_segs[sl], pred_segs[sl],
                                  ours.vkitti_categories())

    assert _stat_dict(ref_stat) == pytest.approx(_our_stat_dict(stat))
    for isthing in (None, True, False):
        ref_avg, _ = ref_stat.pq_average(cats, isthing=isthing)
        our_avg, _ = stat.average(ours.vkitti_categories(),
                                  isthing=isthing)
        for m in ("pq", "sq", "rq", "n"):
            assert our_avg[m] == pytest.approx(ref_avg[m]), (isthing, m)
