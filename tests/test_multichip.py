"""Multi-chip dry-run: the sharded train step must compile and execute
on the virtual 8-device CPU mesh (what the driver validates)."""

import numpy as np
import pytest


@pytest.mark.slow
def test_dryrun_multichip_8():
    import sys
    sys.path.insert(0, ".")
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)


@pytest.mark.slow
def test_entry_compiles():
    import jax

    import sys
    sys.path.insert(0, ".")
    from __graft_entry__ import entry
    fn, args = entry()
    out = jax.jit(fn)(*args)
    for leaf in jax.tree.leaves(out):
        assert bool(np.all(np.isfinite(np.asarray(leaf))))


def test_multihost_helpers_single_host_degenerate():
    """multihost plumbing degenerates correctly on one host (the CPU
    test mesh): global batch assembly shards over the mesh and payload
    gather is identity."""
    import numpy as np
    from jax.sharding import Mesh

    import jax
    from pvo_tpu.parallel import multihost as mh

    assert mh.process_count() == 1 and mh.is_main_process()
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    n = len(jax.devices())
    batch = {"x": np.arange(n * 4, dtype=np.float32).reshape(n, 4)}
    g = mh.global_batch_from_local(mesh, batch)
    assert g["x"].shape == (n, 4)
    assert len(g["x"].sharding.device_set) == n
    np.testing.assert_array_equal(np.asarray(g["x"]), batch["x"])

    payloads = [{"id": 1}, {"id": 2}]
    assert mh.gather_payloads(payloads) == payloads
    mh.sync()
