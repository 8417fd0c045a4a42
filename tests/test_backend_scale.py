"""Backend at reference scale (VERDICT #7).

1. The streaming (edge-chunked) update core is numerically identical to
   the plain core — chunking is pure re-scheduling.
2. A 300-keyframe global-BA graph keeps every proximity edge (no
   silent eviction; reference droid_backend.py:32 max_factors=100000)
   and the streamed update_lowmem executes finite.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pvo_tpu.vo import factor_graph as fg
from pvo_tpu.vo.net import DynamicUpdateModule, GraphAgg

F, h, w = 6, 6, 8


def _setup(E=8, seed=0):
    rng = np.random.RandomState(seed)
    upd = DynamicUpdateModule()
    agg = GraphAgg()
    net0 = jnp.zeros((1, h, w, 128))
    inp0 = jnp.zeros((1, h, w, 128))
    corr0 = jnp.zeros((1, h, w, 196))
    mot0 = jnp.zeros((1, h, w, 8))
    params = {
        "update": upd.init(jax.random.PRNGKey(0), net0, inp0, corr0,
                           mot0),
        "agg": agg.init(jax.random.PRNGKey(1), net0,
                        jnp.zeros((1,), jnp.int32), 1),
    }
    poses = np.zeros((F, 7), np.float32)
    poses[:, 6] = 1.0
    poses[:, 0] = 0.05 * rng.randn(F)
    disps = (1.0 + 0.1 * rng.rand(F, h, w)).astype(np.float32)
    intr = np.asarray([w, w, w / 2.0, h / 2.0], np.float32)
    fmaps = rng.randn(F, h, w, 128).astype(np.float32)
    inps = rng.randn(F, h, w, 128).astype(np.float32)
    segms = rng.randint(0, 4, (F, h, w)).astype(np.int32)

    ii = np.asarray([i % (F - 1) for i in range(E)], np.int32)
    jj = np.asarray([(i % (F - 1)) + 1 for i in range(E)], np.int32)
    valid = np.ones(E, bool)
    valid[-1] = False
    net = 0.1 * rng.randn(E, h, w, 128).astype(np.float32)
    target = rng.rand(E, h, w, 2).astype(np.float32) * [w - 1, h - 1]
    raw = 0.1 * rng.randn(E, h, w, 2).astype(np.float32)
    dy = 0.1 * rng.randn(E, h, w, 2).astype(np.float32)
    return (upd, agg, params, tuple(map(jnp.asarray, (
        poses, disps, intr, fmaps, inps, segms))), tuple(map(
            jnp.asarray, (net, target, raw, dy, ii, jj, valid))))


def test_chunked_core_matches_plain():
    E, CH = 8, 4
    upd, agg, params, vid, edge = _setup(E)
    poses, disps, intr, fmaps, inps, segms = vid
    net, target, raw, dy, ii, jj, valid = edge
    K = F

    common = (params, poses, disps, intr, fmaps, inps, segms,
              net, target, raw, dy, ii, jj, valid, 0, 0.8,
              upd.apply, agg.apply, K, 16, True)
    plain = fg._update_core(*common, corr_chunk=4)
    chunked = fg._update_core_chunked(*common, EB=E, CH=CH)

    names = ("net", "target", "weight", "raw", "dy", "flow", "eta",
             "has_edge")
    for nm, a, b in zip(names, plain, chunked):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-5, atol=2e-5, err_msg=nm)


@pytest.mark.slow
def test_backend_300_keyframes_no_eviction():
    """300 keyframes -> ~1200 neighbor+proximity edges, streamed in
    chunks; nothing is evicted and the update stays finite."""
    from pvo_tpu.utils.config import VOConfig
    from pvo_tpu.vo.backend import Backend
    from pvo_tpu.vo.video import DepthVideo

    NF = 300
    rng = np.random.RandomState(1)
    cfg = VOConfig(image_size=(h * 8, w * 8), buffer=NF + 4,
                   segm_filter=False)
    video = DepthVideo(image_size=cfg.image_size, buffer=NF + 4,
                       segm_filter=False)
    upd, agg, params, _, _ = _setup()

    video.counter = NF
    poses = np.zeros((NF, 7), np.float32)
    poses[:, 6] = 1.0
    poses[:, 0] = np.cumsum(0.1 * np.ones(NF))  # forward motion
    video.poses = video.poses.at[:NF].set(jnp.asarray(poses))
    video.disps = video.disps.at[:NF].set(1.0)
    video.fmaps = video.fmaps.at[:NF].set(jnp.asarray(
        rng.randn(NF, h, w, 128), video.fmaps.dtype))
    video.inps = video.inps.at[:NF].set(jnp.asarray(
        rng.randn(NF, h, w, 128), video.inps.dtype))
    video.intrinsics = video.intrinsics.at[:NF].set(
        jnp.asarray([w, w, w / 2.0, h / 2.0]))

    backend = Backend(video, cfg, upd, agg, params,
                      max_edges=2048, edge_chunk=128)

    # intercept the graph to check edge counts before the update
    counts = {}
    orig_lowmem = fg.FactorGraph.update_lowmem

    def spy(self, *a, **k):
        counts["edges"] = self.n_edges
        counts["chunked"] = self.edge_chunk is not None
        return orig_lowmem(self, *a, **k)

    fg.FactorGraph.update_lowmem = spy
    try:
        backend(steps=1)
    finally:
        fg.FactorGraph.update_lowmem = orig_lowmem

    # neighborhood edges alone: 2 dirs x rad(=2 by default cfg) x NF
    assert counts["edges"] >= 2 * NF, counts
    assert counts["chunked"]
    assert np.isfinite(np.asarray(video.poses[:NF])).all()
    assert np.isfinite(np.asarray(video.disps[:NF])).all()


def test_backend_capacity_scene20_scale():
    """VERDICT round-3 #8: proximity proposal capacity at reference
    scene scale. 420 keyframes (Scene20 is 837 frames; keyframe
    admission halves that) of forward motion WITH a mid-scene return
    loop (revisited geometry = dense off-diagonal candidate band, the
    worst case for edge count) at the backend's parameters (rad=2,
    nms=3, thresh=15). Asserts the 8192-edge bucket holds with
    documented margin and that the distance-sorted cap never engaged
    — i.e. on a vkitti-scale scene NOTHING is dropped.

    Capacity context (PARITY.md): the reference passes
    max_factors=100000 but its add_factors cap only fires when
    remove=True AND corr is materialized (factor_graph.py:122-127);
    the backend uses corr_impl='alt' so it appends ALL accepted edges,
    bounded only by GPU memory (~2.3 MB/edge at 240x808 -> ~4k edges
    on its own 11 GB card). Our bucket exceeds that practical ceiling,
    and over-cap behavior (distance-sorted prefix) keeps the BEST
    edges, matching the reference's sorted accept order."""
    from pvo_tpu.utils.config import VOConfig
    from pvo_tpu.vo.factor_graph import FactorGraph
    from pvo_tpu.vo.video import DepthVideo

    NF = 420
    rng = np.random.RandomState(2)
    video = DepthVideo(image_size=(h * 8, w * 8), buffer=NF + 4,
                       segm_filter=False)
    upd, agg, params, _, _ = _setup()

    video.counter = NF
    # forward 2/3 of the way, then return along the same path: frames
    # (i, NF*2/3 + k) revisit each other's geometry
    step = 0.1
    fwd = int(NF * 2 / 3)
    x = np.concatenate([np.arange(fwd) * step,
                        (fwd - 1 - np.arange(NF - fwd)) * step])
    poses = np.zeros((NF, 7), np.float32)
    poses[:, 6] = 1.0
    poses[:, 0] = x
    video.poses = video.poses.at[:NF].set(jnp.asarray(poses))
    video.disps = video.disps.at[:NF].set(1.0)
    video.intrinsics = video.intrinsics.at[:NF].set(
        jnp.asarray([w, w, w / 2.0, h / 2.0]))
    video.fmaps = video.fmaps.at[:NF].set(jnp.asarray(
        rng.randn(NF, h, w, 128), video.fmaps.dtype))
    video.inps = video.inps.at[:NF].set(jnp.asarray(
        rng.randn(NF, h, w, 128), video.inps.dtype))

    MAXE = 8192
    graph = FactorGraph(
        video, upd, agg, params, max_edges=MAXE, max_inactive=1,
        corr_chunk=16, edge_chunk=128, net_dtype=jnp.bfloat16,
        edge_buckets=(64, 128, 256, 512, 1024, 2048, 4096, 8192),
        pose_buckets=(32, 64, 128, 256, 512),
        pair_buckets=(512, 2048, 8192, 32768, 131072, 524288))
    graph.add_proximity_factors(rad=2, nms=3, thresh=15.0, beta=0.6,
                                max_new=MAXE // 2)

    n = graph.n_edges
    # loop-closure edges must exist (true i<->j revisit pairs)
    gap = np.abs(graph.ii - graph.jj)
    assert int((gap > 50).sum()) > 0, "revisit loop not exercised"
    # capacity: fits the bucket with >25% margin, cap never engaged
    assert n <= MAXE, n
    assert n < MAXE * 0.75, (n, "margin eroded - revisit PARITY.md")
    assert n < 2 * (MAXE // 2), "distance-sorted cap engaged"


def test_proximity_cap_takes_best_edges():
    """Over-cap behavior: the accepted proximity pairs are the
    distance-sorted prefix (closest first) — the same accept order as
    the reference (factor_graph.py:408 argsort loop), just bounded."""
    from pvo_tpu.vo.factor_graph import FactorGraph
    from pvo_tpu.vo.video import DepthVideo

    NF = 24
    rng = np.random.RandomState(3)
    video = DepthVideo(image_size=(h * 8, w * 8), buffer=NF + 4,
                       segm_filter=False)
    upd, agg, params, _, _ = _setup()
    video.counter = NF

    # synthetic distances: pair (i, j) distance grows with j so the
    # sorted accept prefers low-j pairs deterministically
    def dist_fn(ii, jj):
        return 1.0 + 0.1 * np.asarray(jj, np.float64) + \
            0.01 * np.asarray(ii, np.float64)

    def run(max_new):
        g = FactorGraph(video, upd, agg, params, max_edges=256,
                        max_inactive=1, corr_chunk=16, edge_chunk=64)
        g.add_proximity_factors(rad=2, nms=1, thresh=50.0,
                                max_new=max_new, distance_fn=dist_fn)
        return set(zip(g.ii.tolist(), g.jj.tolist()))

    full = run(max_new=128)
    capped = run(max_new=len(full) // 2 // 2 + 8)
    assert capped < full
    # the capped set keeps the best (lowest-distance) accepted pairs:
    # every capped proximity pair must be in the full set, and the
    # dropped ones are the max-distance tail among proximity pairs
    # accept order is on the canonical (i > j) direction; the reverse
    # edge is appended alongside — canonicalize before comparing
    prox_full = {(max(i, j), min(i, j))
                 for (i, j) in full if abs(i - j) > 2}
    prox_cap = {(max(i, j), min(i, j))
                for (i, j) in capped if abs(i - j) > 2}
    assert prox_cap and prox_full - prox_cap
    kept_max = max(dist_fn(i, j) for i, j in prox_cap)
    dropped_min = min(dist_fn(i, j) for i, j in prox_full - prox_cap)
    assert kept_max <= dropped_min + 1e-9
