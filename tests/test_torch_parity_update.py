"""Golden parity: DynamicUpdateModule + GraphAgg vs the reference torch
classes (VO_Module/droid_slam/droid_net.py:64-95, 166-314).

The reference module file imports CUDA extensions (droid_backends),
lietorch, and torch_scatter at module scope; none of those touch the
update operator's forward math, so they are stubbed (scatter_mean gets
a real pure-torch implementation — GraphAgg uses it).

This closes the VERDICT #4 gap: the weight converter
(pvo_tpu/utils/convert.py convert_update/convert_agg) is proven against
reference outputs, not just tree shapes.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/VO_Module/droid_slam"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REF),
                       reason="reference checkout not available"),
]

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pvo_tpu.utils import convert  # noqa: E402
from pvo_tpu.vo.net import DynamicUpdateModule, GraphAgg  # noqa: E402


def _scatter_mean(src, index, dim):
    """Pure-torch torch_scatter.scatter_mean (enough for GraphAgg)."""
    n = int(index.max()) + 1
    shape = list(src.shape)
    shape[dim] = n
    out = torch.zeros(shape, dtype=src.dtype)
    cnt = torch.zeros(n, dtype=src.dtype)
    idx = index.view([-1 if d == dim else 1 for d in range(src.dim())])
    idx = idx.expand_as(src)
    out.scatter_add_(dim, idx, src)
    cnt.scatter_add_(0, index, torch.ones_like(index, dtype=src.dtype))
    cshape = [n if d == dim else 1 for d in range(src.dim())]
    return out / cnt.clamp(min=1).view(cshape)


def _ref_droid_net():
    # stub the native/unavailable imports the module file pulls in
    for name, attrs in (
        ("droid_backends", {}),
        ("lietorch", {"SE3": type("SE3", (), {}),
                      "Sim3": type("Sim3", (), {})}),
        ("torch_scatter", {"scatter_mean": _scatter_mean,
                           "scatter_sum": None}),
    ):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import droid_net as ref_droid_net  # type: ignore
    return ref_droid_net


E, h, w = 3, 6, 8


def test_dynamic_update_module_parity():
    ref = _ref_droid_net()
    torch.manual_seed(0)
    tmod = ref.DynamicUpdateModule().eval()

    rng = np.random.RandomState(3)
    net = np.tanh(rng.randn(1, E, 128, h, w)).astype(np.float32)
    inp = rng.randn(1, E, 128, h, w).astype(np.float32)
    corr = rng.randn(1, E, 196, h, w).astype(np.float32)
    flow = rng.randn(1, E, 8, h, w).astype(np.float32)

    # reference forward with ii=None returns (net, delta[cat dy], weight,
    # delta_m); the `lay` line upstream uses np.range (a reference bug
    # that only works if shimmed)
    np.range = np.arange
    try:
        with torch.no_grad():
            rnet, rdelta, rweight, rmask = tmod(
                torch.from_numpy(net), torch.from_numpy(inp),
                torch.from_numpy(corr), torch.from_numpy(flow))
    finally:
        del np.range
    rnet = rnet.numpy()[0]                      # (E, 128, h, w)
    rdelta = rdelta.numpy()[0]                  # (E, h, w, 4) cam+dy
    rweight = rweight.numpy()[0]                # (E, h, w, 2) logits
    rmask = rmask.numpy()[0]                    # (E, h, w, 2)

    sd = {f"update.{k}": v.numpy() for k, v in tmod.state_dict().items()}
    params = {"params": convert.convert_update(sd, "update")}

    mod = DynamicUpdateModule()
    out = mod.apply(params,
                    jnp.asarray(np.transpose(net[0], (0, 2, 3, 1))),
                    jnp.asarray(np.transpose(inp[0], (0, 2, 3, 1))),
                    jnp.asarray(np.transpose(corr[0], (0, 2, 3, 1))),
                    jnp.asarray(np.transpose(flow[0], (0, 2, 3, 1))))

    tol = dict(rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.transpose(np.asarray(out["net"]), (0, 3, 1, 2)), rnet, **tol)
    np.testing.assert_allclose(np.asarray(out["delta"]),
                               rdelta[..., :2], **tol)
    np.testing.assert_allclose(np.asarray(out["delta_dy"]),
                               rdelta[..., 2:], **tol)
    np.testing.assert_allclose(np.asarray(out["weight_logits"]),
                               rweight, **tol)
    np.testing.assert_allclose(np.asarray(out["delta_mask"]),
                               rmask, **tol)


def test_graph_agg_parity():
    ref = _ref_droid_net()
    torch.manual_seed(1)
    tagg = ref.GraphAgg().eval()

    rng = np.random.RandomState(4)
    net = np.tanh(rng.randn(1, E, 128, h, w)).astype(np.float32)
    ii = np.array([0, 0, 1], np.int64)

    with torch.no_grad():
        reta, rup, _, _ = tagg(torch.from_numpy(net),
                               torch.from_numpy(ii))
    reta = reta.numpy()[0]                      # (F, h, w) eta*0.01
    rup = rup.numpy()[0]                        # (F, 576, h, w)

    sd = {f"update.agg.{k}": v.numpy()
          for k, v in tagg.state_dict().items()}
    params = {"params": convert.convert_agg(sd, "update.agg")}

    agg = GraphAgg()
    # reference compresses ii by unique/inverse; our seg_ids are the
    # frame slots directly (here already dense 0..F-1)
    F = 2
    eta, up = agg.apply(params,
                        jnp.asarray(np.transpose(net[0], (0, 2, 3, 1))),
                        jnp.asarray(ii.astype(np.int32)), F)

    tol = dict(rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(eta)[..., 0], reta, **tol)
    np.testing.assert_allclose(
        np.transpose(np.asarray(up), (0, 3, 1, 2)), rup, **tol)
