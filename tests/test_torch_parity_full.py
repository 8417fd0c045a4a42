"""Golden SYSTEM-level parity: full DroidNet.forward vs the reference.

Runs the reference training forward (droid_net.py:342-440 — corr
pyramid lookup -> DynamicUpdateModule -> mask gating -> 2x python BA
(geom/ba.py:31-106, chol.py:46-73) -> reprojection -> upsample) on the
REAL reference code with its CPU lietorch backend (built by
tests/ref_lietorch.py), against pvo_tpu's DroidNet with converted
weights, and asserts the per-step pose/disp/residual/mask trajectories
match. This catches composition drift (graph indexing, damping,
retraction conventions, scatter ordering) that module-level parity
tests cannot.

Stubbed imports (never touch the compared math):
  * droid_backends.corr_index_forward — pure-torch reimplementation of
    the CUDA bilinear window gather (src/correlation_kernels.cu:19-72),
    itself cross-checked here against our XLA lookup;
  * torch_scatter.scatter_sum/mean — pure-torch equivalents.
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

import jax.numpy as jnp  # noqa: E402

from pvo_tpu.utils import convert  # noqa: E402
from pvo_tpu.vo.net.droidnet import DroidNet  # noqa: E402


# ---------------------------------------------------------------- stubs

def _scatter_sum(src, index, dim=0, dim_size=None):
    n = dim_size if dim_size is not None else int(index.max()) + 1
    shape = list(src.shape)
    shape[dim] = n
    out = torch.zeros(shape, dtype=src.dtype)
    idx = index.view([-1 if d == dim else 1 for d in range(src.dim())])
    return out.scatter_add_(dim, idx.expand_as(src), src)


def _scatter_mean(src, index, dim=0, dim_size=None):
    n = dim_size if dim_size is not None else int(index.max()) + 1
    out = _scatter_sum(src, index, dim, n)
    cnt = torch.zeros(n, dtype=src.dtype).scatter_add_(
        0, index, torch.ones_like(index, dtype=src.dtype))
    cshape = [n if d == dim else 1 for d in range(src.dim())]
    return out / cnt.clamp(min=1).view(cshape)


def _corr_index_forward(volume, coords, r):
    """Pure-torch port of corr_index_forward_kernel semantics
    (src/correlation_kernels.cu:19-72): (2r+1)^2 bilinear window
    gather, out-of-range taps contribute zero. volume: (N,h1,w1,h2,w2),
    coords: (N,2,h1,w1) in (x, y) order. Returns [(N,(2r+1)^2,h1,w1)]
    with dx-major tap order."""
    N, h1, w1, h2, w2 = volume.shape
    x0 = coords[:, 0]
    y0 = coords[:, 1]
    fx = (x0 - torch.floor(x0))[:, None]
    fy = (y0 - torch.floor(y0))[:, None]
    bx = torch.floor(x0).long()
    by = torch.floor(y0).long()
    rd = 2 * r + 1
    vol = volume.reshape(N, h1 * w1, h2, w2)
    qi = torch.arange(h1 * w1)

    def tap(dx, dy):
        """bilinear sample at (bx - r + dx + fx, by - r + dy + fy)."""
        out = torch.zeros(N, h1 * w1, dtype=volume.dtype)
        for ox, wx in ((0, 1 - fx.reshape(N, -1)),
                       (1, fx.reshape(N, -1))):
            for oy, wy in ((0, 1 - fy.reshape(N, -1)),
                           (1, fy.reshape(N, -1))):
                xx = (bx - r + dx + ox).reshape(N, -1)
                yy = (by - r + dy + oy).reshape(N, -1)
                ok = (xx >= 0) & (xx < w2) & (yy >= 0) & (yy < h2)
                xs = xx.clamp(0, w2 - 1)
                ys = yy.clamp(0, h2 - 1)
                for n in range(N):
                    v = vol[n, qi, ys[n], xs[n]]
                    out[n] += torch.where(
                        ok[n], v * wx[n] * wy[n],
                        torch.zeros_like(v))
        return out.view(N, h1, w1)

    taps = [tap(dx, dy) for dx in range(rd) for dy in range(rd)]
    return (torch.stack(taps, dim=1),)


def _install_stubs():
    for name, attrs in (
        ("droid_backends",
         {"corr_index_forward": _corr_index_forward}),
        ("torch_scatter", {"scatter_mean": _scatter_mean,
                           "scatter_sum": _scatter_sum}),
    ):
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod


def _ref_modules():
    """Import reference droid_net + geom with REAL CPU lietorch.

    Clears any previously-imported reference modules (other parity
    tests install a FAKE lietorch stub whose classes would otherwise
    be baked into droid_net's namespace)."""
    from tests import ref_lietorch
    for m in list(sys.modules):
        if m == "droid_net" or m.startswith(("geom", "modules",
                                             "data_readers")):
            del sys.modules[m]
    _install_stubs()
    ref_lietorch.import_lietorch()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import droid_net as ref_droid_net  # type: ignore
    return ref_droid_net


# ----------------------------------------------------------------- test

# 1/8-res must be >= 16x16 or the reference CorrBlock's 4-level
# avg_pool chain underflows (corr.py:34-38)
F_FRAMES, H, W = 5, 128, 128
h, w = H // 8, W // 8
NUM_STEPS = 5


def _ring_graph(n, r=2):
    ii, jj = [], []
    for i in range(n):
        for j in range(n):
            if i != j and abs(i - j) <= r:
                ii.append(i)
                jj.append(j)
    return np.array(ii), np.array(jj)


def test_full_forward_parity():
    ref = _ref_modules()
    import lietorch

    torch.manual_seed(7)
    tmod = ref.DroidNet().eval()

    rng = np.random.RandomState(11)
    images = rng.randint(0, 255, (1, F_FRAMES, 3, H, W)).astype(
        np.float32)
    # small random motions around identity; well-conditioned depths
    tvec = 0.05 * rng.randn(F_FRAMES, 3)
    qvec = np.concatenate(
        [0.02 * rng.randn(F_FRAMES, 3), np.ones((F_FRAMES, 1))], 1)
    qvec /= np.linalg.norm(qvec, axis=-1, keepdims=True)
    poses7 = np.concatenate([tvec, qvec], 1).astype(np.float32)[None]
    disps = (1.0 + 0.2 * rng.rand(1, F_FRAMES, h, w)).astype(np.float32)
    intr = np.array([[30.0, 30.0, w / 2.0, h / 2.0]], np.float32)
    intr = np.repeat(intr, F_FRAMES, 0)[None]

    ii, jj = _ring_graph(F_FRAMES)
    graph = {}
    for i, j in zip(ii, jj):
        graph.setdefault(int(i), []).append(int(j))

    Gs = lietorch.SE3(torch.from_numpy(poses7.copy()))
    np.range = np.arange  # reference bug shim (droid_net.py:295)
    try:
        with torch.no_grad():
            gs_l, disp_l, res_l, mask_l = tmod(
                Gs, torch.from_numpy(images.copy()),
                torch.from_numpy(disps.copy()),
                torch.from_numpy(intr.copy()),
                graph, num_steps=NUM_STEPS)
    finally:
        del np.range

    params = convert.convert_droidnet(
        {k: v.numpy() for k, v in tmod.state_dict().items()})

    net = DroidNet()
    # our model takes RGB channels-last; reference stores BGR (CHW)
    img_j = jnp.asarray(
        np.transpose(images, (0, 1, 3, 4, 2))[..., ::-1].copy())
    out = net.apply(
        {"params": {"fnet": params["fnet"]["params"],
                    "cnet": params["cnet"]["params"],
                    "update": params["update"]["params"],
                    "agg": params["agg"]["params"]}},
        jnp.asarray(poses7), img_j, jnp.asarray(disps),
        jnp.asarray(intr), ii, jj, num_steps=NUM_STEPS)

    for s in range(NUM_STEPS):
        rp = gs_l[s].data.numpy()[0]
        op = np.asarray(out["poses"][s][0], np.float64)
        # quaternion double cover: align signs before comparing
        sign = np.sign(np.sum(rp[:, 3:] * op[:, 3:], -1, keepdims=True))
        op = np.concatenate([op[:, :3], op[:, 3:] * sign], -1)
        np.testing.assert_allclose(
            op, rp, rtol=0, atol=2e-3 * (s + 1),
            err_msg=f"poses diverge at step {s}")

        rd = disp_l[s].numpy()[0]
        od = np.asarray(out["disps_up"][s][0])
        np.testing.assert_allclose(
            od, rd, rtol=0, atol=5e-3 * (s + 1),
            err_msg=f"disps diverge at step {s}")

        rr = res_l[s].numpy()[0]
        orr = np.asarray(out["residuals"][s][0])
        np.testing.assert_allclose(
            orr, rr, rtol=0, atol=5e-3 * (s + 1),
            err_msg=f"residuals diverge at step {s}")

        rm = mask_l[s].numpy()[0]
        om = np.asarray(out["masks_up"][s][0])
        np.testing.assert_allclose(
            om, rm, rtol=0, atol=2e-3 * (s + 1),
            err_msg=f"masks diverge at step {s}")


def test_corr_stub_vs_xla_lookup():
    """The torch corr stub itself must match our XLA lookup — ties the
    oracle to the implementation under test."""
    from pvo_tpu.vo.net import corr as corr_ops

    rng = np.random.RandomState(3)
    E, hh, ww, C = 2, 6, 9, 16
    f1 = rng.randn(E, hh, ww, C).astype(np.float32)
    f2 = rng.randn(E, hh, ww, C).astype(np.float32)
    coords = (rng.rand(E, hh, ww, 2) *
              np.array([ww - 1, hh - 1])).astype(np.float32)

    pyr = corr_ops.build_pyramid(jnp.asarray(f1), jnp.asarray(f2),
                                 num_levels=1)
    ours = np.asarray(corr_ops.lookup(pyr, jnp.asarray(coords)))

    vol = np.einsum("ehwc,eyxc->ehwyx", f1 / 4.0, f2 / 4.0)
    ctorch = torch.from_numpy(
        np.transpose(coords, (0, 3, 1, 2)).copy())
    (ref,) = _corr_index_forward(torch.from_numpy(vol), ctorch, 3)
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))  # (E, h, w, 49)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)
