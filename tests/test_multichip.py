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
