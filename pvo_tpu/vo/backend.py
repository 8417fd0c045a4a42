"""Global bundle adjustment backend.

Rebuild of the reference DroidBackend (VO_Module/droid_slam/
droid_backend.py): normalize the video, build a fresh full-history
factor graph from proximity factors, and run the low-memory update loop
(chunked transient correlation on TPU instead of the reference's
AltCorrBlock CUDA kernel).
"""

from __future__ import annotations

from pvo_tpu.vo.factor_graph import FactorGraph


class Backend:
    def __init__(self, video, cfg, update_module, agg_module, params,
                 max_edges=2048, max_pairs=131072):
        self.video = video
        self.cfg = cfg
        self.update_module = update_module
        self.agg_module = agg_module
        self.params = params
        self.max_edges = max_edges

    def __call__(self, steps=12):
        cfg = self.cfg
        self.video.normalize()

        graph = FactorGraph(
            self.video, self.update_module, self.agg_module, self.params,
            max_edges=self.max_edges, max_inactive=1,
            corr_chunk=16,
            edge_buckets=(64, 128, 256, 512, 1024, 2048),
            pose_buckets=(32, 64, 128, 256, 512),
        )
        graph.add_proximity_factors(
            rad=cfg.backend_radius, nms=cfg.backend_nms,
            thresh=cfg.backend_thresh, beta=cfg.beta,
            max_new=self.max_edges // 2 - self.video.counter * 2)
        graph.update_lowmem(steps=steps)
        graph.clear_edges()
