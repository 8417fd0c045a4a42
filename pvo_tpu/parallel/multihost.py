"""Multi-host plumbing: input sharding + eval gather.

Replaces the reference's torch.distributed gather/synchronize calls
(VPS_Module/detectron2/utils/comm.py:19-99 — NCCL/Gloo all_gather of
pickled prediction payloads, and engine/launch.py process groups) with
the TPU-native recipe: per-host input shards become one global
jax.Array via ``make_array_from_process_local_data``, and evaluation
payloads are gathered with ``multihost_utils.process_allgather`` over
the same mesh. On a single host every helper degenerates to a no-op,
so the same code path serves the CPU test mesh, one chip, and a
multi-host slice.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def global_batch_from_local(mesh: Mesh, local_batch, axis: str = "data"):
    """Assemble each host's local batch shard into one global array
    sharded over ``axis`` (the reference's DistributedSampler +
    per-rank DataLoader, VO_Module/train.py:87-91, becomes: every host
    loads only its shard and this stitches the global view)."""
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        x = np.asarray(x)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        from jax.experimental import multihost_utils
        return multihost_utils.host_local_array_to_global_array(
            x, mesh, P(axis))

    return jax.tree.map(put, local_batch)


def gather_payloads(payloads: Sequence[Any]):
    """Gather per-host python payloads (e.g. PQ prediction dicts) onto
    every host — the reference's comm.gather of pickled bytes
    (panoptic_evaluation.py:118-121). Single-host: identity."""
    if jax.process_count() == 1:
        return list(payloads)
    from jax.experimental import multihost_utils
    import pickle

    blob = np.frombuffer(pickle.dumps(list(payloads)), np.uint8)
    # pad to the max length across hosts (allgather needs equal shapes)
    n = np.asarray([blob.size], np.int64)
    sizes = multihost_utils.process_allgather(n).reshape(-1)
    m = int(sizes.max())
    padded = np.zeros(m, np.uint8)
    padded[:blob.size] = blob
    gathered = multihost_utils.process_allgather(padded)
    out = []
    for row, size in zip(np.asarray(gathered).reshape(-1, m), sizes):
        out.extend(pickle.loads(row[:int(size)].tobytes()))
    return out


def sync():
    """Barrier (the reference's comm.synchronize)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("pvo_tpu_sync")
