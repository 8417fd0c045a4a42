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
