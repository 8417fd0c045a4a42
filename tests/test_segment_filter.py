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


# ---------------------------------------------------------------------------
# PVO thesis test: segm_filter ON beats OFF on a dynamic scene
# ---------------------------------------------------------------------------

import pytest


@pytest.mark.slow
def test_segm_filter_on_beats_off_on_dynamic_scene(monkeypatch):
    """The paper's central claim (reference factor_graph.py:256-280 +
    README metrics): voting whole panoptic segments dynamic improves
    pose accuracy on scenes with moving objects.

    Harness: the oracle-core pattern of test_synth_regression — the
    recurrent operator is replaced by a deterministic model of a
    trained PVO net while the REAL system runs everything else
    (motion-filter choreography, fused-step orchestration, the
    production ``segment_vote_filter`` kernel, the reference's
    ``sigmoid(w + (1-bin_mask)*10)`` weight semantics
    (factor_graph.py:280), damping, the DBA solver, host topology).

    Scene model: far static background (disparity 0.05 — translation
    is nearly unobservable from it) + a near moving van (disparity
    1.0) occupying one panoptic segment. Net model: the cam-flow head
    predicts camera-induced flow segment-wide (it is trained with
    cam_flow_loss on dynamic pixels, reference train.py/losses.py),
    with small matching noise on the near object and large noise on
    the far low-parallax background; the weight head DISTRUSTS the
    moving object (logit -4: high temporal residual); the mask head
    is weak, flagging only ~15% of the van's pixels per edge.

    Mechanism under test: with segm_filter ON (vote threshold 0.12,
    per-scene thresholds are a reference knob, test_vo.py:96-97) the
    15% pixel-level flags trip the segment vote, the WHOLE van is
    marked dynamic, and the weight boost turns its decomposed
    cam-flow predictions into full-confidence BA constraints — the
    only strong translation information in the scene. OFF, only the
    flagged 15% are boosted and the pose leans on the noisy far
    background. Measured on this seed: ATE(off)/ATE(on) = 7.3x
    (0.0218 m vs 0.0030 m); asserted margin 1.8x.
    """
    import jax
    import jax.numpy as jnp

    from pvo_tpu.geom import projective
    from pvo_tpu.lie import se3
    from pvo_tpu.utils.ate import ate_rmse
    from pvo_tpu.vo import factor_graph as fg
    from pvo_tpu.utils.config import VOConfig
    from pvo_tpu.vo.system import VOSystem

    N, H, W = 12, 64, 96
    h, w = H // 8, W // 8

    # GT trajectory: forward translation + slight yaw
    tang = np.zeros((N, 6), np.float32)
    tang[:, 0] = 0.04 * np.arange(N)
    tang[:, 4] = 0.01 * np.arange(N)
    gt_poses = jnp.asarray(np.asarray(
        jax.vmap(se3.exp)(jnp.asarray(tang))))

    # far background, near object (strong parallax)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    obj = ((yy >= 2) & (yy < 7) & (xx >= 3) & (xx < 10))
    disp_np = np.full((h, w), 0.05, np.float32)
    disp_np[obj] = 1.0
    gt_disps = jnp.asarray(np.tile(disp_np, (N, 1, 1)))

    # object image-space motion: px/frame at 1/8 res
    obj_flow = np.array([0.9, 0.35], np.float32)

    # weak mask head: ~15% of object pixels flagged, per-pixel pattern
    flag = obj & (((yy * 7 + xx * 13) % 7) == 0)
    frac = flag.sum() / obj.sum()
    assert 0.10 < frac < 0.25, frac

    obj_j = jnp.asarray(obj)
    flag_j = jnp.asarray(flag)
    yyf = jnp.asarray(yy, jnp.float32)
    xxf = jnp.asarray(xx, jnp.float32)

    def oracle_core(params, poses, disps, intrinsics, fmaps, inps,
                    segms, net, target_cam, raw_mask, delta_dy,
                    ii, jj, valid, w0, seg_thresh, update_apply,
                    agg_apply, K, S_MAX, segm_filter, corr_chunk=16,
                    segms_e=None, **_kw):
        E = ii.shape[0]
        F = poses.shape[0]
        gp = jnp.concatenate(
            [gt_poses, jnp.tile(gt_poses[-1:], (F - N, 1))])[None]
        gd = jnp.concatenate(
            [gt_disps, jnp.tile(gt_disps[-1:], (F - N, 1, 1))])[None]
        intr_b = jnp.broadcast_to(intrinsics, (1, F, 4))
        coords_gt, vmask = projective.projective_transform(
            gp, gd, intr_b, ii, jj)
        vm = valid[:, None, None, None].astype(jnp.float32) * \
            vmask[0].astype(jnp.float32)

        # deterministic matching noise: small on the near textured
        # object, large on the far low-parallax background
        ph = ii.astype(jnp.float32)[:, None, None]
        nz_u = jnp.sin(2.1 * yyf + 1.7 * xxf + 3.3 * ph)
        nz_v = jnp.cos(1.3 * yyf + 2.9 * xxf + 5.1 * ph)
        amp = jnp.where(obj_j, 0.10, 0.50)
        noise = jnp.stack([nz_u * amp, nz_v * amp], -1)[..., :, :]

        target = coords_gt[0] + noise
        weight_logits = jnp.where(obj_j, -4.0, -2.0)[None, ..., None]
        weight_logits = jnp.broadcast_to(
            weight_logits, target.shape).astype(jnp.float32)

        # mask head: flags `flag` pixels dynamic, everything else static
        raw_new = jnp.where(flag_j, -8.0, 8.0)[None, ..., None]
        raw_new = jnp.broadcast_to(raw_new, target.shape)
        bin_mask = (jax.nn.sigmoid(raw_new) >= fg.DY_THRESH)

        if segm_filter:
            se = segms_e if segms_e is not None else segms[ii]
            bin_mask = fg.segment_vote_filter(bin_mask, se, valid,
                                              S_MAX, seg_thresh)
        bin_mask = bin_mask.astype(jnp.float32)

        # the reference's exact weight semantics (factor_graph.py:280)
        weight = jax.nn.sigmoid(weight_logits +
                                (1.0 - bin_mask) * 10.0) * vm

        # dy head: object flow, gated like the reference (:281)
        dtf = (jj - ii).astype(jnp.float32)[:, None, None, None]
        dy_out = jnp.where(obj_j[None, ..., None],
                           jnp.asarray(obj_flow), 0.0) * dtf
        new_dy = dy_out * (1.0 - bin_mask)

        coords0 = projective.coords_grid(h, w)
        eta = 1e-4 * jnp.ones((K, h, w), jnp.float32)
        counts = jax.ops.segment_sum(
            valid.astype(jnp.int32),
            jnp.where(valid, ii - w0, K).astype(jnp.int32),
            num_segments=K + 1)[:K]
        return (net, target, weight, raw_new, new_dy,
                target - coords0, eta, counts > 0)

    monkeypatch.setattr(fg, "_update_core", oracle_core)
    fg._fused_step.clear_cache()

    # panoptic segments: van = one segment, background = another
    segm_map = np.where(obj, 130001, 20000).astype(np.int32)

    rng = np.random.RandomState(3)
    base = rng.randint(0, 255, (H * 2, W * 2, 3), np.uint8)
    intr = np.array([40.0, 40.0, W / 2, H / 2], np.float32)

    def run(filter_on):
        cfg = VOConfig(image_size=(H, W), buffer=64, warmup=5,
                       filter_thresh=-1.0, keyframe_thresh=0.0,
                       frontend_window=8, max_edges=96,
                       max_inactive=64, segm_filter=filter_on,
                       thresh=0.12, pipeline=False)
        sysm = VOSystem(cfg)
        for t in range(N):
            dy0, dx0 = (2 * t) % H, (3 * t) % W
            img = base[dy0:dy0 + H, dx0:dx0 + W]
            sysm.track(t, img, intr, segments=segm_map)
        sysm.frontend.flush()
        est = jnp.asarray(sysm.get_traj())
        k = est.shape[0]
        est_xyz = np.asarray(se3.inv(est))[:, :3]
        gt_xyz = np.asarray(se3.inv(gt_poses[:k]))[:, :3]
        return ate_rmse(est_xyz, gt_xyz)

    try:
        ate_on = run(True)
        fg._fused_step.clear_cache()
        ate_off = run(False)
    finally:
        fg._fused_step.clear_cache()

    assert np.isfinite(ate_on) and np.isfinite(ate_off)
    # segm_filter ON must beat OFF by a real margin
    assert ate_on < 0.02, ate_on
    assert ate_off > 1.8 * ate_on, (ate_off, ate_on)


@pytest.mark.slow
def test_pvo_iterate_loop_improves_ate(monkeypatch):
    """The README's iterate-the-loop claim (reference README.md:44:
    "you can get the results in the paper by iterating multiple
    times"), demonstrated end-to-end on the dynamic synthetic scene:

      iteration 1: VO runs with the INITIAL segmentation, which only
        found the moving van in frame 0 (a missed-detection model of
        a weak initial Panoptic FPN pass) — the segment vote cannot
        fire on unlabeled frames, so the van's accurate decomposed
        cam-flow never gets its confidence boost there and the pose
        leans on the noisy far background;
      VPS feedback: the REAL tracking stage
        (pipeline.tracking.forward_splat_ids, reference
        1_tracking.py) propagates the van label along the scene's
        full flow frame-by-frame, producing the fused pan_seg maps
        the loop driver (scripts/run_pvo_loop.py feedback_segmentation)
        feeds back;
      iteration 2: VO re-runs with the propagated segmentation; the
        vote fires on every frame;
      iteration 3: feedback of an already-converged segmentation
        changes nothing — the loop is monotone, not oscillating.

    Scene/oracle model identical to
    test_segm_filter_on_beats_off_on_dynamic_scene (see its docstring
    for the mechanism); measured on this seed: iteration-1 ATE
    0.0172 m -> iteration-2 ATE 0.0030 m (5.8x), iteration 3 == 2
    (converged).
    """
    import jax
    import jax.numpy as jnp

    from pvo_tpu.geom import projective
    from pvo_tpu.lie import se3
    from pvo_tpu.pipeline.tracking import forward_splat_ids
    from pvo_tpu.utils.ate import ate_rmse
    from pvo_tpu.utils.config import VOConfig
    from pvo_tpu.vo import factor_graph as fg
    from pvo_tpu.vo.system import VOSystem

    N, H, W = 12, 64, 96
    h, w = H // 8, W // 8

    tang = np.zeros((N, 6), np.float32)
    tang[:, 0] = 0.04 * np.arange(N)
    tang[:, 4] = 0.01 * np.arange(N)
    gt_poses = jnp.asarray(np.asarray(
        jax.vmap(se3.exp)(jnp.asarray(tang))))

    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    obj = ((yy >= 2) & (yy < 7) & (xx >= 3) & (xx < 10))
    disp_np = np.full((h, w), 0.05, np.float32)
    disp_np[obj] = 1.0
    gt_disps = jnp.asarray(np.tile(disp_np, (N, 1, 1)))

    obj_flow = np.array([0.9, 0.35], np.float32)
    flag = obj & (((yy * 7 + xx * 13) % 7) == 0)

    obj_j = jnp.asarray(obj)
    flag_j = jnp.asarray(flag)
    yyf = jnp.asarray(yy, jnp.float32)
    xxf = jnp.asarray(xx, jnp.float32)

    def oracle_core(params, poses, disps, intrinsics, fmaps, inps,
                    segms, net, target_cam, raw_mask, delta_dy,
                    ii, jj, valid, w0, seg_thresh, update_apply,
                    agg_apply, K, S_MAX, segm_filter, corr_chunk=16,
                    segms_e=None, **_kw):
        F = poses.shape[0]
        gp = jnp.concatenate(
            [gt_poses, jnp.tile(gt_poses[-1:], (F - N, 1))])[None]
        gd = jnp.concatenate(
            [gt_disps, jnp.tile(gt_disps[-1:], (F - N, 1, 1))])[None]
        intr_b = jnp.broadcast_to(intrinsics, (1, F, 4))
        coords_gt, vmask = projective.projective_transform(
            gp, gd, intr_b, ii, jj)
        vm = valid[:, None, None, None].astype(jnp.float32) * \
            vmask[0].astype(jnp.float32)

        ph = ii.astype(jnp.float32)[:, None, None]
        nz_u = jnp.sin(2.1 * yyf + 1.7 * xxf + 3.3 * ph)
        nz_v = jnp.cos(1.3 * yyf + 2.9 * xxf + 5.1 * ph)
        amp = jnp.where(obj_j, 0.10, 0.50)
        noise = jnp.stack([nz_u * amp, nz_v * amp], -1)[..., :, :]

        target = coords_gt[0] + noise
        weight_logits = jnp.where(obj_j, -4.0, -2.0)[None, ..., None]
        weight_logits = jnp.broadcast_to(
            weight_logits, target.shape).astype(jnp.float32)

        raw_new = jnp.where(flag_j, -8.0, 8.0)[None, ..., None]
        raw_new = jnp.broadcast_to(raw_new, target.shape)
        bin_mask = (jax.nn.sigmoid(raw_new) >= fg.DY_THRESH)

        if segm_filter:
            se = segms_e if segms_e is not None else segms[ii]
            bin_mask = fg.segment_vote_filter(bin_mask, se, valid,
                                              S_MAX, seg_thresh)
        bin_mask = bin_mask.astype(jnp.float32)
        weight = jax.nn.sigmoid(weight_logits +
                                (1.0 - bin_mask) * 10.0) * vm

        dtf = (jj - ii).astype(jnp.float32)[:, None, None, None]
        dy_out = jnp.where(obj_j[None, ..., None],
                           jnp.asarray(obj_flow), 0.0) * dtf
        new_dy = dy_out * (1.0 - bin_mask)

        coords0 = projective.coords_grid(h, w)
        eta = 1e-4 * jnp.ones((K, h, w), jnp.float32)
        counts = jax.ops.segment_sum(
            valid.astype(jnp.int32),
            jnp.where(valid, ii - w0, K).astype(jnp.int32),
            num_segments=K + 1)[:K]
        return (net, target, weight, raw_new, new_dy,
                target - coords0, eta, counts > 0)

    monkeypatch.setattr(fg, "_update_core", oracle_core)
    fg._fused_step.clear_cache()

    VAN, BG = 130001, 20000
    segm_full = np.where(obj, VAN, BG).astype(np.int32)
    segm_bg = np.full((h, w), BG, np.int32)

    rng = np.random.RandomState(3)
    base = rng.randint(0, 255, (H * 2, W * 2, 3), np.uint8)
    intr = np.array([40.0, 40.0, W / 2, H / 2], np.float32)

    def run(segms_per_frame):
        cfg = VOConfig(image_size=(H, W), buffer=64, warmup=5,
                       filter_thresh=-1.0, keyframe_thresh=0.0,
                       frontend_window=8, max_edges=96,
                       max_inactive=64, segm_filter=True,
                       thresh=0.12, pipeline=False)
        sysm = VOSystem(cfg)
        for t in range(N):
            dy0, dx0 = (2 * t) % H, (3 * t) % W
            img = base[dy0:dy0 + H, dx0:dx0 + W]
            sysm.track(t, img, intr, segments=segms_per_frame[t])
        sysm.frontend.flush()
        est = jnp.asarray(sysm.get_traj())
        k = est.shape[0]
        est_xyz = np.asarray(se3.inv(est))[:, :3]
        gt_xyz = np.asarray(se3.inv(gt_poses[:k]))[:, :3]
        fg._fused_step.clear_cache()
        return ate_rmse(est_xyz, gt_xyz)

    def vps_feedback(segms_in):
        """The loop's VPS stage on the synthetic scene: propagate each
        frame's fused map from its predecessor along the scene's full
        flow with the production splat, keeping any labels the
        'detector' already found (the matching stage's keep-consistent
        rule, reference 2_matching.py semantics)."""
        out = [segms_in[0]]
        for t in range(1, N):
            # full flow of frame t-1 -> t: camera flow (near-zero on
            # the far background at this baseline) + object flow on
            # the van — what test_vo2 exports into shared_data
            fl = np.zeros((h, w, 2), np.float32)
            fl[obj] = obj_flow
            warped = forward_splat_ids(out[-1], fl)
            merged = np.where(warped == VAN, VAN,
                              segms_in[t]).astype(np.int32)
            out.append(merged)
        return out

    try:
        # initial segmentation: detector found the van ONLY in frame 0
        segms_it1 = [segm_full if t == 0 else segm_bg
                     for t in range(N)]
        ate1 = run(segms_it1)

        segms_it2 = vps_feedback(segms_it1)
        # feedback must actually have propagated the van label
        assert sum((s == VAN).any() for s in segms_it2) >= N - 1
        ate2 = run(segms_it2)

        segms_it3 = vps_feedback(segms_it2)
        ate3 = run(segms_it3)
    finally:
        fg._fused_step.clear_cache()

    assert np.isfinite(ate1) and np.isfinite(ate2) and np.isfinite(ate3)
    print(f"pvo-loop ATE: it1={ate1:.4f} it2={ate2:.4f} "
          f"it3={ate3:.4f} (x{ate1 / ate2:.1f})")
    assert ate2 < ate1 / 1.8, (ate1, ate2)       # iteration improves
    assert ate3 <= ate2 * 1.05, (ate2, ate3)     # and converges
