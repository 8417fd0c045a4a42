"""Golden parity tests vs the reference torch modules (CPU).

These instantiate the REFERENCE's pure-torch modules (extractor/gru —
no CUDA extensions needed) with random weights, convert the weights with
pvo_tpu.utils.convert, and check our flax modules produce identical
outputs. This validates conv padding/stride alignment, norm semantics,
and the OIHW->HWIO conversion — the exact contract needed to load the
reference's published checkpoints.

Skipped when torch or the reference checkout is unavailable.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/VO_Module/droid_slam/modules"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pvo_tpu.utils import convert  # noqa: E402
from pvo_tpu.vo.net import BasicEncoder, ConvGRU  # noqa: E402


def _ref_modules():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import extractor as ref_extractor  # type: ignore
    import gru as ref_gru  # type: ignore
    return ref_extractor, ref_gru


@pytest.mark.parametrize("norm_fn,out_dim", [("instance", 128),
                                             ("none", 256)])
def test_basic_encoder_parity(norm_fn, out_dim):
    ref_extractor, _ = _ref_modules()
    torch.manual_seed(0)
    tnet = ref_extractor.BasicEncoder(output_dim=out_dim,
                                      norm_fn=norm_fn).eval()

    x = np.random.RandomState(1).randn(2, 3, 48, 64).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x)[None]).numpy()  # (1,2,C,h,w)

    sd = {f"x.{k}": v.numpy() for k, v in tnet.state_dict().items()}
    params = {"params": convert.convert_encoder(sd, "x")}

    enc = BasicEncoder(output_dim=out_dim, norm_fn=norm_fn)
    ours = enc.apply(params, jnp.asarray(
        np.transpose(x, (0, 2, 3, 1))))           # (2,h,w,C)
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))[None]

    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_conv_gru_parity():
    _, ref_gru = _ref_modules()
    torch.manual_seed(0)
    tg = ref_gru.ConvGRU(128, 128 + 128 + 64).eval()

    rng = np.random.RandomState(2)
    net = np.tanh(rng.randn(2, 128, 6, 8)).astype(np.float32)
    i1 = rng.randn(2, 128, 6, 8).astype(np.float32)
    i2 = rng.randn(2, 128, 6, 8).astype(np.float32)
    i3 = rng.randn(2, 64, 6, 8).astype(np.float32)

    with torch.no_grad():
        ref = tg(torch.from_numpy(net), torch.from_numpy(i1),
                 torch.from_numpy(i2), torch.from_numpy(i3)).numpy()

    sd = {f"g.{k}": v.numpy() for k, v in tg.state_dict().items()}
    p = {}
    for name in ("convz", "convr", "convq", "w",
                 "convz_glo", "convr_glo", "convq_glo"):
        convert._conv(sd, f"g.{name}", p, name)
    params = {"params": p}

    gru = ConvGRU(128)
    tr = lambda a: jnp.asarray(np.transpose(a, (0, 2, 3, 1)))
    inp = jnp.concatenate([tr(i1), tr(i2), tr(i3)], axis=-1)
    ours = gru.apply(params, tr(net), inp)
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))

    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)
