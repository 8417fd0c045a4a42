"""Tests for VO->VPS pipeline: tracking, matching, PQ/VPQ."""

import numpy as np

from pvo_tpu.pipeline.matching import InstanceMatcher
from pvo_tpu.pipeline.pq import pq_compute, tube_pq_stat, vpq_compute
from pvo_tpu.pipeline.tracking import forward_splat_ids


def square_map(h, w, boxes):
    """boxes: list of (id, y0, y1, x0, x1)."""
    m = np.zeros((h, w), np.int64)
    for sid, y0, y1, x0, x1 in boxes:
        m[y0:y1, x0:x1] = sid
    return m


CAR = 13  # vkitti thing trainId


class TestTracking:
    def test_splat_shifts(self):
        seg = square_map(16, 16, [(CAR * 10000 + 1, 4, 8, 4, 8)])
        flow = np.zeros((16, 16, 2), np.float32)
        flow[..., 0] = 3  # shift right
        out = forward_splat_ids(seg, flow)
        assert out[5, 8] == CAR * 10000 + 1
        assert out[5, 4] == 0

    def test_depth_resolves_collisions(self):
        seg = np.zeros((8, 8), np.int64)
        seg[2, 2] = 100
        seg[2, 4] = 200
        flow = np.zeros((8, 8, 2), np.float32)
        flow[2, 2, 0] = 2  # 100 lands on (2,4)... both end at (2,4)
        depth = np.ones((8, 8), np.float32)
        depth[2, 2] = 1.0  # nearer
        depth[2, 4] = 5.0
        out = forward_splat_ids(seg, flow, depth)
        assert out[2, 4] == 100  # near pixel wins


class TestMatching:
    def test_propagates_ids(self):
        m = InstanceMatcher()
        f0 = square_map(32, 32, [(CAR * 10000 + 7, 4, 12, 4, 12)])
        r0 = m(f0, np.zeros_like(f0))
        first_id = r0[6, 6]
        assert first_id // 10000 == CAR

        # frame 1: same object moved slightly; warped prev overlaps
        f1 = square_map(32, 32, [(CAR * 10000 + 3, 5, 13, 6, 14)])
        warped = square_map(32, 32, [(CAR * 10000 + 7, 5, 13, 5, 13)])
        r1 = m(f1, warped)
        assert r1[8, 8] == first_id  # id propagated

    def test_new_object_gets_fresh_id(self):
        m = InstanceMatcher()
        f0 = square_map(32, 32, [(CAR * 10000 + 1, 0, 8, 0, 8)])
        r0 = m(f0, np.zeros_like(f0))
        f1 = square_map(32, 32, [(CAR * 10000 + 1, 0, 8, 0, 8),
                                 (CAR * 10000 + 2, 20, 28, 20, 28)])
        warped = square_map(32, 32, [(CAR * 10000 + 1, 0, 8, 0, 8)])
        r1 = m(f1, warped)
        assert r1[4, 4] == r0[4, 4]
        assert r1[24, 24] != 0 and r1[24, 24] != r1[4, 4]

    def test_stuff_relabeled_but_category_kept(self):
        """The reference matcher tracks every non-void segment with
        category <= 14 — including stuff (2_matching.py _filter_thing
        only drops cat 0 / cat > 14), so stuff ids gain an instance
        part while keeping their category."""
        m = InstanceMatcher()
        f0 = square_map(16, 16, [(5 * 10000, 0, 16, 0, 16),
                                 (CAR * 10000 + 1, 2, 6, 2, 6)])
        r0 = m(f0, np.zeros_like(f0))
        assert r0[10, 10] // 10000 == 5
        assert r0[10, 10] % 10000 != 0


CATS = {13: {"isthing": 1, "name": "Car"},
        5: {"isthing": 0, "name": "Building"}}


def segs_of(m, crowd=()):
    # COCO-panoptic segments always carry "area"; pq.py trusts the GT
    # json areas like the reference does (pq_compute.py:88)
    out = []
    for sid, area in zip(*np.unique(m, return_counts=True)):
        if sid == 0:
            continue
        out.append({"id": int(sid), "category_id": int(sid // 10000),
                    "area": int(area),
                    "iscrowd": 1 if sid in crowd else 0})
    return out


class TestPQ:
    def test_perfect_prediction(self):
        g = square_map(64, 64, [(5 * 10000, 0, 32, 0, 64),
                                (CAR * 10000 + 1, 40, 60, 10, 30)])
        res, _ = pq_compute([g], [g.copy()], [segs_of(g)],
                            [segs_of(g)], CATS)
        assert abs(res["All"]["pq"] - 1.0) < 1e-9
        assert abs(res["Things"]["pq"] - 1.0) < 1e-9

    def test_miss_counts_fn(self):
        g = square_map(64, 64, [(CAR * 10000 + 1, 0, 32, 0, 32)])
        p = np.zeros_like(g)
        stat = tube_pq_stat([g], [p], [segs_of(g)], [segs_of(p)], CATS)
        assert stat[CAR].fn == 1 and stat[CAR].tp == 0

    def test_vpq_windows(self):
        # identical 6-frame sequence: VPQ = 1 for all windows
        g = square_map(32, 32, [(CAR * 10000 + 2, 4, 20, 4, 20)])
        gs = [g.copy() for _ in range(6)]
        segs = [segs_of(g) for _ in range(6)]
        avg, per_k = vpq_compute(gs, gs, segs, segs, CATS,
                                 windows=(1, 5))
        assert abs(avg["All"]["pq"] - 1.0) < 1e-9

    def test_vpq_penalizes_id_switch(self):
        g = square_map(32, 32, [(CAR * 10000 + 2, 4, 20, 4, 20)])
        gs = [g.copy() for _ in range(5)]
        # prediction switches instance id mid-sequence
        p1 = g.copy()
        p2 = square_map(32, 32, [(CAR * 10000 + 9, 4, 20, 4, 20)])
        ps = [p1, p1, p2, p2, p2]
        gsegs = [segs_of(g) for _ in range(5)]
        psegs = [segs_of(p) for p in ps]
        avg, per_k = vpq_compute(gs, ps, gsegs, psegs, CATS,
                                 windows=(1, 5))
        assert per_k[1]["All"]["pq"] > 0.99  # per-frame is perfect
        assert per_k[5]["All"]["pq"] < 0.5   # tube IoU broken by switch


def test_pq_multiprocess_matches_single():
    """pq_compute(workers=2) (reference pq_compute_multi_core analog)
    must equal the single-process result."""
    g = np.zeros((24, 32), np.int64)
    g[4:12, 4:12] = 13 * 10000 + 1
    g[14:20, 10:28] = 5 * 10000
    maps_g, maps_p, segs_g, segs_p = [], [], [], []
    for t in range(8):
        p = np.roll(g, t % 3, axis=1)
        maps_g.append(g)
        maps_p.append(p)
        segs_g.append(segs_of(g))
        segs_p.append(segs_of(p))
    r1, s1 = pq_compute(maps_g, maps_p, segs_g, segs_p, CATS)
    r2, s2 = pq_compute(maps_g, maps_p, segs_g, segs_p, CATS,
                        workers=2)
    assert r1 == r2
    assert {k: (v.tp, v.fp, v.fn, v.iou) for k, v in s1.per_cat.items()} \
        == {k: (v.tp, v.fp, v.fn, v.iou) for k, v in s2.per_cat.items()}
