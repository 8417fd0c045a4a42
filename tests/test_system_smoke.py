"""End-to-end smoke test: the full VO system machinery on a tiny
synthetic scene with random weights.

This does not check accuracy (weights are random) — it checks that the
whole host/device choreography runs: motion filter, keyframe admission,
graph init, proximity factors, recurrent updates + DBA, keyframe
removal, backend global BA, and trajectory filling.
"""

import numpy as np
import pytest

from pvo_tpu.utils.config import VOConfig
from pvo_tpu.vo.system import VOSystem


@pytest.fixture(autouse=True, scope="module")
def _no_cache_writes():
    """Serializing this module's large system executables into the
    persistent compilation cache SEGFAULTS when dozens of programs
    were already compiled in-process (jaxlib put_executable_and_time,
    observed twice in full slow-lane runs round 5, never standalone).
    Suppress cache WRITES here; reads stay enabled."""
    import jax

    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      1e9)
    yield
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      1.0)


def synth_stream(n=30, H=64, W=96, seed=0):
    """Moving textured pattern (enough structure for corr to latch)."""
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 255, (H * 2, W * 2, 3), np.uint8)
    fx = fy = 40.0
    intr = np.array([fx, fy, W / 2, H / 2], np.float32)
    for t in range(n):
        dy, dx = 2 * t % H, 3 * t % W
        img = base[dy:dy + H, dx:dx + W]
        segm = np.zeros((H // 8, W // 8), np.int32)
        yield t, img, intr, segm


@pytest.mark.slow
def test_vo_system_runs_end_to_end():
    cfg = VOConfig(
        image_size=(64, 96), buffer=64, warmup=5,
        filter_thresh=0.01,       # admit almost everything
        keyframe_thresh=0.0,      # never remove (random weights)
        frontend_window=8, max_edges=96, max_inactive=64,
        segm_filter=True)
    sysm = VOSystem(cfg)

    frames = list(synth_stream(12))
    for (t, img, intr, segm) in frames:
        sysm.track(t, img, intr, segments=segm)

    assert sysm.video.counter >= cfg.warmup
    assert sysm.frontend.is_initialized

    traj_kf = sysm.get_traj()
    assert traj_kf.shape[1] == 7
    assert np.all(np.isfinite(traj_kf))

    traj = sysm.terminate(iter(frames), need_inv=True,
                          backend_steps=(2,))
    assert traj.shape == (len(frames), 7)
    assert np.all(np.isfinite(traj))

    depth = sysm.get_depth()
    assert depth.shape == (sysm.video.counter, 64, 96)


@pytest.mark.slow
@pytest.mark.parametrize("pipeline", [False, True])
def test_keyframe_removal_paths(pipeline):
    """Deferred keyframe removal fires under a high keyframe_thresh,
    combined with both admission outcomes (the speculative-append and
    rejected-frame shift ranges differ): the system must stay
    consistent — counter matches frontend t1, poses finite, graph
    indices in range. Runs both the classic packet protocol and the
    planner (device-topology) mode; the latter's host mirrors are
    reconstructed at disengage, so the internal reads below go through
    the same sync the public accessors use."""
    import numpy as np

    cfg = VOConfig(
        image_size=(64, 96), buffer=64, warmup=5,
        filter_thresh=0.01,
        keyframe_thresh=1000.0,   # remove (almost) every keyframe
        frontend_window=8, max_edges=96, max_inactive=64,
        segm_filter=False, pipeline=pipeline)
    sysm = VOSystem(cfg)

    frames = list(synth_stream(16))
    for i, (t, img, intr, segm) in enumerate(frames):
        # alternate admissions after warmup so removal coincides with
        # both appended and rejected frames
        sysm.filterx.thresh = 1e9 if (i > 8 and i % 3 == 0) else -1.0
        sysm.track(t, img, intr, segments=segm)
    sysm._sync()
    pending = getattr(sysm, "_pending_adm", None)
    if pending is not None:
        sysm.filterx.resolve_track(pending)
        sysm._pending_adm = None
    sysm.frontend.flush()

    v = sysm.video
    g = sysm.frontend.graph
    assert sysm.frontend.t1 == v.counter
    assert np.all(np.isfinite(np.asarray(v.poses[:v.counter])))
    if g.n_edges:
        assert g.ii.max() < v.counter and g.jj.max() < v.counter
        assert g.ii.min() >= 0 and g.jj.min() >= 0
