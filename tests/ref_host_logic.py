"""Pure-numpy oracle of the reference's SLAM host decision logic.

Faithful reimplementation (from reading, not copying) of the
reference's edge-proposal / retirement / keyframe-removal host code:

- FactorGraph.add_factors dedup + max_factors eviction quirk
  (VO_Module/droid_slam/factor_graph.py:107-161, :117 filter vs
  active+inactive, :122-127 the ``argsort(age) >= cap-len(new)`` mask
  applied in EDGE order — a permutation quirk replicated verbatim)
- FactorGraph.rm_factors / rm_keyframe (factor_graph.py:163-225)
- add_neighborhood_factors / add_proximity_factors with the exact
  double-loop diamond-NMS + greedy distance scan
  (factor_graph.py:362-429)
- DroidFrontend.__initialize / __update decision sequence
  (droid_frontend.py:36-101): age retirement, proximity proposal,
  iters1 updates, keyframe-removal probe d(t1-3, t1-2) < thresh,
  else iters2 updates.

Distances are INJECTED as a pure function of frame identities so the
oracle (and the system under test) need no device; every decision is
recorded as an event keyed by frame ids.
"""

import numpy as np


class RefHostOracle:
    """Reference frontend + factor-graph host logic, numpy-only."""

    def __init__(self, dist_f, warmup=12, iters1=4, iters2=2,
                 max_age=25, window=25, radius=2, nms=1,
                 thresh=12.0, kf_thresh=2.25, max_factors=48):
        self.f = dist_f            # (frame_a, frame_b) -> distance
        self.warmup = warmup
        self.iters1 = iters1
        self.iters2 = iters2
        self.max_age = max_age
        self.window = window
        self.radius = radius
        self.nms = nms
        self.thresh = thresh
        self.kf_thresh = kf_thresh
        self.max_factors = max_factors

        self.frames = []           # committed frame ids
        self.ii = np.zeros(0, np.int64)
        self.jj = np.zeros(0, np.int64)
        self.age = np.zeros(0, np.int64)
        self.ii_inac = np.zeros(0, np.int64)
        self.jj_inac = np.zeros(0, np.int64)
        self.ii_bad = np.zeros(0, np.int64)
        self.jj_bad = np.zeros(0, np.int64)
        self.has_corr = False      # reference `self.corr is not None`

        self.t1 = 0
        self.is_initialized = False
        self.events = []           # ("add"/"rm"/"rm_kf", payload)

    # ---------------- graph ops ----------------

    def _pairs(self, ii, jj):
        return [(self.frames[i], self.frames[j])
                for i, j in zip(ii, jj)]

    def dist(self, ii, jj, seeded=False):
        """Injected pair distances. ``seeded=True`` models the
        reference's pose state at __update's add_proximity time: the
        NEWEST keyframe (index t-1) has never been BA-refined — its
        pose is the seed copied from its predecessor
        (droid_frontend.py:64-66), so its distances are those of the
        predecessor's pose."""
        t = len(self.frames)

        def fid(k):
            k = int(k)
            if seeded and k == t - 1:
                return self.frames[k - 1]
            return self.frames[k]

        return np.array([self.f(fid(i), fid(j))
                         for i, j in zip(ii, jj)], np.float64)

    def update_op(self):
        """One graph.update() call (factor_graph.py:307 ages +1)."""
        self.age = self.age + 1

    def add_factors(self, ii, jj, remove=False):
        ii = np.asarray(ii, np.int64).reshape(-1)
        jj = np.asarray(jj, np.int64).reshape(-1)
        eset = set(zip(self.ii.tolist(), self.jj.tolist())) | \
            set(zip(self.ii_inac.tolist(), self.jj_inac.tolist()))
        keep = [k for k in range(len(ii))
                if (int(ii[k]), int(jj[k])) not in eset]
        ii, jj = ii[keep], jj[keep]
        if len(ii) == 0:
            return
        if self.max_factors > 0 and \
                len(self.ii) + len(ii) > self.max_factors and \
                self.has_corr and remove:
            mask = np.argsort(self.age, kind="stable") >= \
                self.max_factors - len(ii)
            self.rm_factors(mask, store=True)
        self.events.append(
            ("add", sorted(self._pairs(ii, jj))))
        self.ii = np.concatenate([self.ii, ii])
        self.jj = np.concatenate([self.jj, jj])
        self.age = np.concatenate(
            [self.age, np.zeros(len(ii), np.int64)])
        self.has_corr = True

    def rm_factors(self, mask, store=False):
        mask = np.asarray(mask, bool)
        if mask.sum():
            self.events.append(
                ("rm", sorted(self._pairs(self.ii[mask],
                                          self.jj[mask])), bool(store)))
        if store:
            self.ii_inac = np.concatenate([self.ii_inac,
                                           self.ii[mask]])
            self.jj_inac = np.concatenate([self.jj_inac,
                                           self.jj[mask]])
        self.ii = self.ii[~mask]
        self.jj = self.jj[~mask]
        self.age = self.age[~mask]

    def rm_keyframe(self, ix):
        self.events.append(("rm_kf", self.frames[ix]))
        del self.frames[ix]
        m = (self.ii == ix) | (self.jj == ix)
        self.ii = np.where(self.ii >= ix, self.ii - 1, self.ii)
        self.jj = np.where(self.jj >= ix, self.jj - 1, self.jj)
        self.ii_inac = np.where(self.ii_inac >= ix,
                                self.ii_inac - 1, self.ii_inac)
        self.jj_inac = np.where(self.jj_inac >= ix,
                                self.jj_inac - 1, self.jj_inac)
        self.rm_factors(m, store=False)

    def add_neighborhood_factors(self, t0, t1, r=3):
        ii, jj = np.meshgrid(np.arange(t0, t1), np.arange(t0, t1),
                             indexing="ij")
        ii, jj = ii.reshape(-1), jj.reshape(-1)
        keep = (np.abs(ii - jj) > 0) & (np.abs(ii - jj) <= r)
        self.add_factors(ii[keep], jj[keep])

    def add_proximity_factors(self, t0=0, t1=0, rad=2, nms=2,
                              thresh=16.0, remove=False, seeded=False):
        t = len(self.frames)
        ix = np.arange(t0, t)
        jx = np.arange(t1, t)
        if len(ix) == 0 or len(jx) == 0:
            return
        ii, jj = np.meshgrid(ix, jx, indexing="ij")
        ii, jj = ii.reshape(-1), jj.reshape(-1)
        d = self.dist(ii, jj, seeded=seeded)
        d[ii - rad < jj] = np.inf
        d[d > 100] = np.inf

        def suppress(i, j):
            r = max(min(abs(i - j) - 2, nms), 0)
            for di in range(-nms, nms + 1):
                for dj in range(-nms, nms + 1):
                    if abs(di) + abs(dj) <= r:
                        i1, j1 = i + di, j + dj
                        if t0 <= i1 < t and t1 <= j1 < t:
                            d[(i1 - t0) * (t - t1) + (j1 - t1)] = np.inf

        ii1 = np.concatenate([self.ii, self.ii_bad, self.ii_inac])
        jj1 = np.concatenate([self.jj, self.jj_bad, self.jj_inac])
        for i, j in zip(ii1.tolist(), jj1.tolist()):
            if abs(i - j) <= 2:
                continue
            suppress(i, j)

        es = []
        for i in range(t0, t):
            for j in range(i + 1, min(i + rad + 1, t)):
                es.append((i, j))
                es.append((j, i))

        for k in np.argsort(d):
            if d[k] > thresh:
                continue
            i, j = int(ii[k]), int(jj[k])
            es.append((i, j))
            es.append((j, i))
            suppress(i, j)

        es = np.asarray(es, np.int64)
        self.add_factors(es[:, 0], es[:, 1], remove)

    # ---------------- frontend ----------------

    def _initialize(self):
        self.t1 = len(self.frames)
        self.add_neighborhood_factors(0, self.t1, r=3)
        for _ in range(8):
            self.update_op()
        self.add_proximity_factors(0, 0, rad=2, nms=2,
                                   thresh=self.thresh)
        for _ in range(12):
            self.update_op()
        self.is_initialized = True

    def _update(self):
        self.t1 += 1
        if self.has_corr:
            self.rm_factors(self.age > self.max_age, store=True)
        self.add_proximity_factors(
            self.t1 - 5, max(self.t1 - self.window, 0),
            rad=self.radius, nms=self.nms, thresh=self.thresh,
            remove=True, seeded=True)
        for _ in range(self.iters1):
            self.update_op()
        a, b = self.frames[self.t1 - 3], self.frames[self.t1 - 2]
        dprobe = 0.5 * (self.f(a, b) + self.f(b, a))
        if dprobe < self.kf_thresh:
            self.rm_keyframe(self.t1 - 2)
            self.t1 -= 1
        else:
            for _ in range(self.iters2):
                self.update_op()

    def track(self, frame_id):
        """Admit one keyframe and run the frontend step."""
        self.frames.append(frame_id)
        if not self.is_initialized and \
                len(self.frames) == self.warmup:
            self._initialize()
        elif self.is_initialized and self.t1 < len(self.frames):
            self._update()
