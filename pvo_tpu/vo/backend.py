"""Global bundle adjustment backend.

Rebuild of the reference DroidBackend (VO_Module/droid_slam/
droid_backend.py): normalize the video, build a fresh full-history
factor graph from proximity factors, and run the low-memory update loop
(chunked transient correlation on TPU instead of the reference's
AltCorrBlock CUDA kernel).
"""

from __future__ import annotations

import jax.numpy as jnp

from pvo_tpu.vo.factor_graph import FactorGraph


class Backend:
    def __init__(self, video, cfg, update_module, agg_module, params,
                 max_edges=8192, max_pairs=131072, edge_chunk=256):
        self.video = video
        self.cfg = cfg
        self.update_module = update_module
        self.agg_module = agg_module
        self.params = params
        self.max_edges = max_edges
        self.edge_chunk = edge_chunk

    def __call__(self, steps=12):
        cfg = self.cfg
        self.video.normalize()

        # full-history graph at reference scale (droid_backend.py:32
        # max_factors=100000): beyond one edge_chunk the update streams
        # over chunks and the hidden state is stored bf16, so ~10k-edge
        # graphs fit HBM without eviction
        graph = FactorGraph(
            self.video, self.update_module, self.agg_module, self.params,
            max_edges=self.max_edges, max_inactive=1,
            corr_chunk=16, edge_chunk=self.edge_chunk,
            net_dtype=jnp.bfloat16,
            edge_buckets=(64, 128, 256, 512, 1024, 2048, 4096, 8192),
            pose_buckets=(32, 64, 128, 256, 512),
            pair_buckets=(512, 2048, 8192, 32768, 131072, 524288),
        )
        # cap at buffer capacity (the reference passes max_factors=
        # 100000, i.e. effectively unbounded, droid_backend.py:32);
        # add_proximity_factors counts 2 list entries per (i,j) pair,
        # so max_edges//2 admits exactly max_edges edges
        graph.add_proximity_factors(
            rad=cfg.backend_radius, nms=cfg.backend_nms,
            thresh=cfg.backend_thresh, beta=cfg.beta,
            max_new=self.max_edges // 2)
        graph.update_lowmem(steps=steps)
        graph.clear_edges()
