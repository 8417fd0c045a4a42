"""Unit tests for the on-device dynamic-segment vote filter."""

import jax.numpy as jnp
import numpy as np

from pvo_tpu.vo.factor_graph import segment_vote_filter

S_MAX = 8


def test_majority_dynamic_segment_killed():
    E, h, w = 1, 4, 8
    segm = np.zeros((E, h, w), np.int32)
    segm[0, :, :4] = 1  # segment 1 covers the left half

    bin_mask = np.ones((E, h, w, 2), bool)
    # 90% of segment 1's pixels dynamic (both channels 0)
    bin_mask[0, :, :4] = False
    bin_mask[0, 0, 0] = True  # a couple of static pixels
    bin_mask[0, 0, 1] = True

    out = np.asarray(segment_vote_filter(
        jnp.asarray(bin_mask), jnp.asarray(segm),
        jnp.ones(E, bool), S_MAX, 0.8))
    # whole segment 1 forced dynamic — including its static pixels
    assert not out[0, :, :4].any()
    # background (segment 0) untouched
    assert out[0, :, 4:].all()


def test_minority_dynamic_segment_survives():
    E, h, w = 1, 4, 8
    segm = np.ones((E, h, w), np.int32)  # all one segment
    bin_mask = np.ones((E, h, w, 2), bool)
    bin_mask[0, 0, :2] = False  # only 2/32 pixels dynamic

    out = np.asarray(segment_vote_filter(
        jnp.asarray(bin_mask), jnp.asarray(segm),
        jnp.ones(E, bool), S_MAX, 0.8))
    np.testing.assert_array_equal(out, bin_mask)


def test_segment_zero_never_killed():
    E, h, w = 1, 2, 4
    segm = np.zeros((E, h, w), np.int32)
    bin_mask = np.zeros((E, h, w, 2), bool)  # everything dynamic
    out = np.asarray(segment_vote_filter(
        jnp.asarray(bin_mask), jnp.asarray(segm),
        jnp.ones(E, bool), S_MAX, 0.8))
    np.testing.assert_array_equal(out, bin_mask)  # unchanged (no kill)


def test_per_edge_independence():
    E, h, w = 2, 2, 4
    segm = np.ones((E, h, w), np.int32)
    bin_mask = np.ones((E, h, w, 2), bool)
    bin_mask[0] = False  # edge 0's segment fully dynamic
    out = np.asarray(segment_vote_filter(
        jnp.asarray(bin_mask), jnp.asarray(segm),
        jnp.ones(E, bool), S_MAX, 0.8))
    assert not out[0].any()
    assert out[1].all()  # edge 1 unaffected


class TestSwapCompaction:
    """Host/device consistency of swap-based edge retirement: after any
    drop pattern, (ii, jj) rows must still pair with their device
    buffer rows (checked via a sentinel written per edge)."""

    def _graph(self, n):
        import numpy as np
        import jax.numpy as jnp
        from pvo_tpu.vo import factor_graph as fgm
        from pvo_tpu.vo.net import DynamicUpdateModule, GraphAgg
        from pvo_tpu.vo.video import DepthVideo

        video = DepthVideo(image_size=(16, 16), buffer=8,
                           segm_filter=False)
        upd = DynamicUpdateModule()
        agg = GraphAgg()
        params = {"update": None, "agg": None}
        g = fgm.FactorGraph.__new__(fgm.FactorGraph)
        h = w = 2
        g.video = video
        g.max_edges = 16
        g.max_inactive = 16
        g.max_factors = -1
        g.edge_buckets = (16,)
        g.inactive_buckets = (0, 16)
        g.h, g.w = h, w
        g.ii = np.arange(n, dtype=np.int64)
        g.jj = np.arange(n, dtype=np.int64) + 100
        g.age = np.zeros(n, np.int64)
        g.fresh = np.zeros(n, bool)
        g.ii_inac = np.zeros(0, np.int64)
        g.jj_inac = np.zeros(0, np.int64)
        g.ii_bad = np.zeros(0, np.int64)
        g.jj_bad = np.zeros(0, np.int64)
        # sentinel: device row r carries value == host edge id
        E = g.max_edges
        ids = np.zeros((E, h, w, 2), np.float32)
        ids[:n] = np.arange(n)[:, None, None, None]
        g.net = jnp.zeros((E, h, w, 128))
        g.target_cam = jnp.asarray(ids)
        g.weight = jnp.asarray(ids)
        g.raw_mask = jnp.asarray(ids)
        g.delta_dy = jnp.asarray(ids)
        g.full_flow = jnp.asarray(ids)
        g.target_inac = jnp.zeros((16, h, w, 2))
        g.weight_inac = jnp.zeros((16, h, w, 2))
        g._loc = np.arange(n, dtype=np.int64)
        g._pend_store = []
        g._ring_evict = 0
        g._ring_base = 0
        return g

    def test_rows_track_host_arrays(self):
        import itertools
        import numpy as np

        for pattern in ([0], [5], [0, 5], [2, 3, 4], [0, 1, 2, 3, 4, 5],
                        [5, 4], [1, 3, 5]):
            g = self._graph(6)
            ids0 = {int(i): int(v) for i, v in zip(
                g.ii, np.asarray(g.target_cam)[:6, 0, 0, 0])}
            mask = np.zeros(6, bool)
            mask[pattern] = True
            g.rm_factors(mask, store=True)
            g.flush_compaction()    # retirement is deferred now
            tc = np.asarray(g.target_cam)
            for r, i in enumerate(g.ii):
                assert ids0[int(i)] == int(tc[r, 0, 0, 0]), \
                    (pattern, r, i)
            assert len(g.ii) == 6 - len(pattern)
            assert len(g.ii_inac) == len(pattern)


def test_filter_edges_drops_weak_longrange():
    """filter_edges removes long-range (|i-j| > 2) edges whose mean
    confidence fell below 1e-3 and remembers them as bad (reference
    factor_graph.py:92-99)."""
    import numpy as np
    import jax.numpy as jnp

    g = TestSwapCompaction()._graph(4)
    # edges: (0,100),(1,101),(2,102),(3,103) -> make them long-range
    g.jj = g.ii + np.array([1, 5, 6, 2])
    w = np.zeros((16, 2, 2, 2), np.float32)
    w[0] = 1.0    # short-range, strong
    w[1] = 1.0    # long-range, strong -> kept
    w[2] = 1e-5   # long-range, weak -> dropped
    w[3] = 1e-5   # short-range, weak -> kept (range <= 2)
    g.weight = jnp.asarray(w)
    g.filter_edges()
    kept = set(zip(g.ii.tolist(), g.jj.tolist()))
    assert (0, 1) in kept and (1, 6) in kept and (3, 5) in kept
    assert (2, 8) not in kept
    assert (g.ii_bad.tolist(), g.jj_bad.tolist()) == ([2], [8])
