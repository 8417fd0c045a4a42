"""Sliding-window local bundle adjustment frontend.

Rebuild of the reference DroidFrontend (VO_Module/droid_slam/
droid_frontend.py): initialization at ``warmup`` keyframes (neighborhood
factors + 8 updates, proximity factors + 12 updates), then per-keyframe
updates (age-based factor retirement, proximity factor proposal,
4+2 recurrent updates, redundant-keyframe removal).

TPU orchestration: the whole per-keyframe update is ONE device program
(see factor_graph._fused_step) — 4 updates, the keyframe-removal
distance probe, the conditional 2 extra updates (lax.cond on device),
next-pose seeding, and the sliding-window distance matrix for the NEXT
keyframe's proximity proposal. The host reads back one small packet per
fused program and resolves it at the START of the next one, so the
removal decision and the fresh distances are applied exactly where the
reference applies them, but the host never stalls mid-frame:

    frame t:  commit admission(t-1)                 [free read]
              dispatch motion-filter(t)             [async]
              resolve packet of fused(kf t-2): maybe rm_keyframe,
                cache dmat                          [rode out a full
                                                     frame of device
                                                     time -> cheap]
              build topology for keyframe t-1       [pure numpy]
              dispatch fused program(kf t-1)        [async]

The fused update for keyframe k runs while frame k+1 streams in
(system.py track choreography): wall time per frame is the device time
itself, and the program sequence is identical to the serialized order.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

DMAT_WINDOW = 32


class Frontend:
    def __init__(self, graph, video, cfg):
        self.graph = graph
        self.video = video
        self.cfg = cfg

        self.t0 = 0
        self.t1 = 0
        self.is_initialized = False
        self.count = 0

        self.max_age = cfg.max_age
        self.iters1 = cfg.frontend_iters1
        self.iters2 = cfg.frontend_iters2

        # pending device packet: (device_array, d0, t1_at_dispatch)
        self._packet = None
        # resolved distance matrix for THIS frame's topology
        self._dmat = None
        self._d0 = 0

    # ---------------- packet protocol ----------------

    def resolve(self):
        """Public idempotent packet resolution (applies any deferred
        keyframe removal; used before state reads outside the track
        loop)."""
        self._resolve_packet()

    def _resolve_packet(self):
        """Fetch the pending packet (from the fused program dispatched
        LAST frame — in the pipelined choreography it has ridden out a
        full frame of device time, so the read is cheap); apply the
        deferred keyframe-removal decision; cache the distance
        matrix."""
        if self._packet is None:
            return
        dev, d0, t1p, steps2 = self._packet
        self._packet = None
        host = np.asarray(dev)           # the per-frame device sync
        self._apply_packet(host, d0, t1p, steps2)

    def _apply_packet(self, host, d0, t1p, steps2):
        d = float(host[0])
        dmat = host[1:].reshape(DMAT_WINDOW, DMAT_WINDOW)

        if d < self.cfg.keyframe_thresh:
            # remove the redundant keyframe (reference removes it
            # before its next update; deferring one host step keeps
            # the device branch-free — the 2 extra updates were
            # already skipped on device by the lax.cond)
            ix = t1p - 2
            self.rm_keyframe_deferred(ix)
            self.t1 -= 1
            self.video.counter -= 1
            # remap the distance matrix over the removed slot
            k = ix - d0
            if 0 <= k < DMAT_WINDOW:
                dmat = np.delete(np.delete(dmat, k, 0), k, 1)
                pad = DMAT_WINDOW - dmat.shape[0]
                dmat = np.pad(dmat, ((0, pad), (0, pad)),
                              constant_values=np.inf)

        else:
            # the keep-keyframe branch ran the conditional extra
            # updates on device — credit their age now (the reference
            # only ages edges for updates that executed,
            # droid_frontend.py:52-62)
            if steps2:
                self.graph.age_credit(steps2)

        self._dmat = dmat
        self._d0 = d0

    def rm_keyframe_deferred(self, ix):
        """Keyframe removal one host-step after the probe (the
        reference's rm_keyframe, factor_graph.py:202-225). Every slot
        above ``ix`` shifts down one: the committed keyframes, plus the
        row at slot ``counter`` — which holds the NEXT-keyframe seed
        written by the last fused step (droid_frontend.py:64-66) and,
        in the pipelined choreography, this frame's speculative
        motion-filter append (its admission is committed next frame
        against the post-shift counter, so the bookkeeping stays
        exact). The shift ops queue behind that append on device, so
        ordering is correct."""
        v = self.video
        end = v.counter
        for off in range(ix, end):
            v.remove_frame(off)
        g = self.graph
        m = (g.ii == ix) | (g.jj == ix)
        g.ii = np.where(g.ii >= ix, g.ii - 1, g.ii)
        g.jj = np.where(g.jj >= ix, g.jj - 1, g.jj)
        g.ii_inac = np.where(g.ii_inac >= ix, g.ii_inac - 1, g.ii_inac)
        g.jj_inac = np.where(g.jj_inac >= ix, g.jj_inac - 1, g.jj_inac)
        g.rm_factors(m, store=False)

    def _distance_lookup(self, ii, jj):
        """Pair distances for proximity proposal: from the packet's
        matrix when available, else a (sync) device call."""
        if self._dmat is not None:
            a = np.asarray(ii) - self._d0
            b = np.asarray(jj) - self._d0
            ok = (a >= 0) & (a < DMAT_WINDOW) & (b >= 0) & \
                (b < DMAT_WINDOW)
            d = np.full(len(a), np.inf)
            d[ok] = self._dmat[a[ok], b[ok]]
            return d
        return np.asarray(self.video.distance(ii, jj,
                                              beta=self.cfg.beta),
                          np.float64)

    # ---------------- per-keyframe update ----------------

    def _update(self, mf=None):
        """One per-keyframe update. ``mf``: optional motion-filter
        work for the INCOMING frame (MotionFilter.prepare dict +
        params/apply fns) merged into the same device program; its
        (admitted, state) is returned (None when not consumed)."""
        cfg = self.cfg
        self.count += 1
        self.t1 += 1

        self._resolve_packet()

        if self.graph.n_edges > 0:
            self.graph.rm_factors(self.graph.age > self.max_age,
                                  store=True)

        self.graph.add_proximity_factors(
            self.t1 - 5, max(self.t1 - cfg.frontend_window, 0),
            rad=cfg.frontend_radius, nms=cfg.frontend_nms,
            thresh=cfg.frontend_thresh, beta=cfg.beta, remove=True,
            distance_fn=self._distance_lookup)

        # ONE device program: (optional) motion-filter prologue for
        # the incoming frame + iters1 updates + removal probe +
        # conditional iters2 updates + seeding + next distance matrix
        packet, d0 = self.graph.update(
            None, None, use_inactive=True, steps=self.iters1,
            dist_pair=(self.t1 - 3, self.t1 - 2),
            steps2=self.iters2, kf_thresh=cfg.keyframe_thresh,
            seed_ix=self.t1, dmat_window=DMAT_WINDOW, mf=mf)
        # queue the d2h NOW (it streams the moment the program
        # retires); starting it at resolve time instead costs an extra
        # relay round-trip on the critical path
        try:
            packet.copy_to_host_async()
        except AttributeError:
            pass
        self._packet = (packet, d0, self.t1, self.iters2)
        return self.graph._last_mf if mf is not None else None

    def _initialize(self):
        self.t0 = 0
        self.t1 = self.video.counter

        self.graph.add_neighborhood_factors(self.t0, self.t1, r=3)
        self.graph.update(1, use_inactive=True, steps=8)

        self.graph.add_proximity_factors(
            0, 0, rad=2, nms=2, thresh=self.cfg.frontend_thresh)
        self.graph.update(1, use_inactive=True, steps=12)

        v = self.video
        v.poses = v.poses.at[self.t1].set(v.poses[self.t1 - 1])
        v.disps = v.disps.at[self.t1].set(
            jnp.mean(v.disps[self.t1 - 4:self.t1]))

        self.is_initialized = True
        self.video.ready = True

    def __call__(self, mf=None):
        """``mf``: optional motion-filter work to merge into the fused
        update's device program (see _update). Returns its
        (admitted, state) when consumed, else None — the caller then
        dispatches the standalone motion-filter program."""
        if not self.is_initialized and \
                self.video.counter == self.cfg.warmup:
            self._initialize()
        elif self.is_initialized and self.t1 < self.video.counter:
            return self._update(mf=mf)
        return None

    def flush(self):
        """Resolve any pending packet (call before terminate/backend:
        a deferred keyframe removal must land before global BA)."""
        self._resolve_packet()
        self._dmat = None
