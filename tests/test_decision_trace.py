"""Decision-trace parity: our Frontend + FactorGraph host logic vs a
pure-numpy oracle of the reference's exact host code.

VERDICT round-2 missing #3 / next #5: the frontend's decision SEQUENCE
(which edges are proposed/retired, which keyframes are removed, in what
order) was only covered by self-tests. Here the device is stubbed out
(distances injected as a pure function of frame identity, exactly as a
recorded run would inject them) and the full decision trace — add /
retire / cap-evict / keyframe-removal events keyed by frame ids — must
match tests/ref_host_logic.RefHostOracle, which reimplements
droid_frontend.py:36-101 and factor_graph.py:107-225,:362-429 verbatim.

The packet protocol's one-frame deferral means our rm_kf events land in
the stream one host-step later than the reference's serialized order,
but the DECISIONS (which frame, against which distances, applied before
the next topology build) must be identical — so each event stream is
compared separately, plus the final graph state.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pvo_tpu.utils.config import VOConfig
from pvo_tpu.vo.factor_graph import FactorGraph
from pvo_tpu.vo.frontend import DMAT_WINDOW, Frontend

from ref_host_logic import RefHostOracle


def dist_f(a, b):
    """Injected pair distance: pure function of frame ids, asymmetric,
    value-distinct (no argsort ties). Close pairs land under the
    proximity threshold; every 4th adjacent pair is 'slow' (probe
    below keyframe_thresh -> removal)."""
    if a == b:
        return 0.0
    d = 3.0 * abs(a - b) + ((a * 131 + b * 29) % 199) / 199.0
    if abs(a - b) == 1 and max(a, b) % 4 == 0:
        d = 1.0 + ((a * 17 + b) % 13) / 26.0
    return d


class FakeVideo:
    """Host-only DepthVideo stand-in: frame-id bookkeeping + injected
    distances; poses/disps only as dummies for Frontend._initialize."""

    def __init__(self, buffer=256, hw=(4, 4)):
        self.counter = 0
        self.frames = []
        self.h, self.w = hw
        self.poses = jnp.zeros((buffer, 7)).at[:, 6].set(1.0)
        self.disps = jnp.ones((buffer, hw[0], hw[1]))
        self.ready = False

    def append(self, fid):
        if self.counter < len(self.frames):
            self.frames[self.counter] = fid
        else:
            self.frames.append(fid)
        self.counter += 1

    def remove_frame(self, off):
        if off + 1 < len(self.frames):
            self.frames[off] = self.frames[off + 1]

    def distance(self, ii, jj, beta=0.6, bidirectional=False):
        d = np.array([dist_f(self.frames[int(i)], self.frames[int(j)])
                      for i, j in zip(np.ravel(ii), np.ravel(jj))])
        if bidirectional:
            dr = np.array(
                [dist_f(self.frames[int(j)], self.frames[int(i)])
                 for i, j in zip(np.ravel(ii), np.ravel(jj))])
            d = 0.5 * (d + dr)
        return d


class TraceGraph(FactorGraph):
    """The real FactorGraph host logic with the device program stubbed:
    update() performs only its host-visible effects (age, fresh/pending
    consumption) and fabricates the packet (probe + window distance
    matrix) from the injected distance function."""

    def __init__(self, video, max_factors=48, max_edges=2048,
                 max_inactive=2048, beta=0.6):
        # host-only init (the real __init__ builds device buffers and
        # parameter trees the stub never touches)
        self.video = video
        self.beta = beta
        self.max_edges = max_edges
        self.max_inactive = max_inactive
        self.max_factors = max_factors
        self.ii = np.zeros(0, np.int64)
        self.jj = np.zeros(0, np.int64)
        self.age = np.zeros(0, np.int64)
        self.ii_inac = np.zeros(0, np.int64)
        self.jj_inac = np.zeros(0, np.int64)
        self.ii_bad = np.zeros(0, np.int64)
        self.jj_bad = np.zeros(0, np.int64)
        self.fresh = np.zeros(0, bool)
        self._loc = np.zeros(0, np.int64)
        self._pend_store = []
        self._ring_evict = 0
        self._ring_base = 0
        self._last_d0 = 0
        self.events = []

    def _pairs(self, ii, jj):
        fr = self.video.frames
        return [(fr[int(i)], fr[int(j)]) for i, j in zip(ii, jj)]

    def add_factors(self, ii, jj, remove=False):
        eset = self._existing()
        ai = np.asarray(ii, np.int64).reshape(-1)
        aj = np.asarray(jj, np.int64).reshape(-1)
        keep = [k for k in range(len(ai))
                if (int(ai[k]), int(aj[k])) not in eset]
        super().add_factors(ii, jj, remove)
        if keep:
            self.events.append(
                ("add", sorted(self._pairs(ai[keep], aj[keep]))))

    def rm_factors(self, mask, store=False):
        mask = np.asarray(mask, bool)
        if mask.sum():
            self.events.append(
                ("rm", sorted(self._pairs(self.ii[mask],
                                          self.jj[mask])), bool(store)))
        super().rm_factors(mask, store)

    def update(self, t0=None, t1=None, itrs=2, use_inactive=False,
               EP=1e-7, motion_only=False, steps=1, dist_pair=None,
               steps2=0, kf_thresh=0.0, seed_ix=None, dmat_window=0,
               mf=None):
        if self.n_edges == 0:
            return None, 0
        self.fresh = np.zeros(self.n_edges, bool)
        self._mark_flushed()
        v = self.video
        d0 = max(0, int(v.counter) + 1 - dmat_window) \
            if dmat_window else 0
        self._last_d0 = d0
        probe = np.inf
        if dist_pair is not None and dist_pair != (0, 0):
            fa = v.frames[dist_pair[0]]
            fb = v.frames[dist_pair[1]]
            probe = 0.5 * (dist_f(fa, fb) + dist_f(fb, fa))
        packet = [probe]
        if dmat_window:
            # the device dmat covers [d0, counter] INCLUSIVE: slot
            # ``counter`` is the seeded next-keyframe pose (copy of
            # its predecessor, _fused seed_ix), so the next frame's
            # proposal distances are the predecessor's — exactly the
            # reference's seeded-pose state (droid_frontend.py:64-66)
            W = dmat_window
            dm = np.full((W, W), np.inf)
            hi = min(d0 + W, int(v.counter) + 1)

            def fid(k):
                return v.frames[min(k, int(v.counter) - 1)]

            for a in range(d0, hi):
                for b in range(d0, hi):
                    if a != b:
                        dm[a - d0, b - d0] = dist_f(fid(a), fid(b))
            packet = np.concatenate([packet, dm.ravel()])
        self.age += steps
        return np.asarray(packet, np.float64), d0


class TraceFrontend(Frontend):
    def rm_keyframe_deferred(self, ix):
        self.graph.events.append(("rm_kf", self.video.frames[ix]))
        super().rm_keyframe_deferred(ix)


def _streams(events):
    """Split an event list into comparable streams."""
    return {
        "add": [e[1] for e in events if e[0] == "add"],
        "rm_store": [e[1] for e in events
                     if e[0] == "rm" and e[2]],
        "rm_drop": [e[1] for e in events
                    if e[0] == "rm" and not e[2]],
        "rm_kf": [e[1] for e in events if e[0] == "rm_kf"],
    }


@pytest.mark.parametrize("n_frames", [60])
def test_frontend_decision_trace_matches_reference(n_frames):
    cfg = VOConfig(image_size=(32, 32), warmup=12)
    video = FakeVideo()
    graph = TraceGraph(video, max_factors=48, beta=cfg.beta)
    fe = TraceFrontend(graph, video, cfg)

    oracle = RefHostOracle(
        dist_f, warmup=cfg.warmup, iters1=cfg.frontend_iters1,
        iters2=cfg.frontend_iters2, max_age=cfg.max_age,
        window=cfg.frontend_window, radius=cfg.frontend_radius,
        nms=cfg.frontend_nms, thresh=cfg.frontend_thresh,
        kf_thresh=cfg.keyframe_thresh, max_factors=48)

    for t in range(n_frames):
        video.append(t)
        fe()
        oracle.track(t)
    fe.flush()

    got = _streams(graph.events)
    want = _streams(oracle.events)

    # the sequences of removed keyframes must match exactly
    assert got["rm_kf"] == want["rm_kf"]
    assert len(got["rm_kf"]) >= 3, "synthetic run must exercise removal"

    # every edge-proposal batch, in order
    assert got["add"] == want["add"]

    # retirements (age/cap, stored) and keyframe-drop retirements
    assert got["rm_store"] == want["rm_store"]
    assert got["rm_drop"] == want["rm_drop"]

    # final graph state in frame-id space
    fr = video.frames
    got_active = sorted((fr[i], fr[j])
                        for i, j in zip(graph.ii, graph.jj))
    ofr = oracle.frames
    want_active = sorted((ofr[i], ofr[j])
                         for i, j in zip(oracle.ii, oracle.jj))
    assert got_active == want_active
    np.testing.assert_array_equal(
        np.sort(graph.age), np.sort(oracle.age))
