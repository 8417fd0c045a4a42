"""Golden parity: VPS trunk modules vs the reference detectron2 classes
(VPS_Module/detectron2/modeling/...), with converted weights.

Random weights are loaded into each reference torch module, converted
with pvo_tpu.utils.convert_vps, and outputs compared — proving the
OIHW->HWIO mapping, FrozenBN folding, GN semantics, FPN top-down
arithmetic, and head layouts that panFPN.pth loading depends on
(VERDICT #4 / SURVEY hard-part #6).

The reference tree needs its heavy deps stubbed — see d2_stubs.py.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/VPS_Module"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REF),
                       reason="reference checkout not available"),
]

sys.path.insert(0, os.path.dirname(__file__))
import d2_stubs  # noqa: E402

d2_stubs.install(REF)

import jax.numpy as jnp  # noqa: E402

from pvo_tpu.utils import convert_vps as cv  # noqa: E402

TOL = dict(rtol=3e-4, atol=3e-4)


def _randomize(mod, seed):
    """Random weights incl. FrozenBN buffers (var > 0)."""
    g = torch.Generator().manual_seed(seed)
    sd = mod.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            if "running_var" in k:
                sd[k] = 0.5 + torch.rand(v.shape, generator=g)
            else:
                sd[k] = 0.1 * torch.randn(v.shape, generator=g)
    mod.load_state_dict(sd)
    return mod


def _nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def _build_ref_resnet():
    from detectron2.modeling.backbone.resnet import (BasicStem,
                                                     BottleneckBlock,
                                                     ResNet)
    stem = BasicStem(in_channels=3, out_channels=64, norm="FrozenBN")
    stages = []
    in_ch, out_ch, bottleneck = 64, 256, 64
    for i, n in enumerate((3, 4, 6, 3)):
        stages.append(ResNet.make_stage(
            BottleneckBlock, n,
            stride_per_block=[1 if i == 0 else 2] + [1] * (n - 1),
            in_channels=in_ch, bottleneck_channels=bottleneck,
            out_channels=out_ch, norm="FrozenBN",
            stride_in_1x1=True))
        in_ch, out_ch, bottleneck = out_ch, out_ch * 2, bottleneck * 2
    return ResNet(stem, stages,
                  out_features=["res2", "res3", "res4", "res5"])


def test_resnet50_parity():
    from pvo_tpu.vps.resnet import ResNet50

    ref = _randomize(_build_ref_resnet(), 0).eval()
    x = 0.5 * torch.randn(1, 3, 64, 96,
                          generator=torch.Generator().manual_seed(9))
    with torch.no_grad():
        refs = ref(x)

    sd = {f"backbone.bottom_up.{k}": v.numpy()
          for k, v in ref.state_dict().items()}
    params = {"params": cv.convert_backbone(sd)}

    ours = ResNet50().apply(params, jnp.asarray(_nhwc(x)))
    for name in ("res2", "res3", "res4", "res5"):
        np.testing.assert_allclose(np.asarray(ours[name]),
                                   _nhwc(refs[name]), **TOL)


def test_fpn_parity():
    from detectron2.modeling.backbone.fpn import FPN as RefFPN
    from detectron2.modeling.backbone.fpn import LastLevelMaxPool

    from pvo_tpu.vps.fpn import FPN
    from pvo_tpu.vps.resnet import ResNet50

    bu = _randomize(_build_ref_resnet(), 1)
    ref = RefFPN(bottom_up=bu,
                 in_features=["res2", "res3", "res4", "res5"],
                 out_channels=256, norm="",
                 top_block=LastLevelMaxPool()).eval()
    ref = _randomize(ref, 2)
    x = 0.5 * torch.randn(1, 3, 64, 96,
                          generator=torch.Generator().manual_seed(8))
    with torch.no_grad():
        refs = ref(x)

    sd = {f"backbone.{k}": v.numpy() for k, v in ref.state_dict().items()}
    bb_params = {"params": cv.convert_backbone(sd)}
    fpn_params = {"params": cv.convert_fpn(sd)}

    feats = ResNet50().apply(bb_params, jnp.asarray(_nhwc(x)))
    ours = FPN().apply(fpn_params, feats)
    for name in ("p2", "p3", "p4", "p5", "p6"):
        np.testing.assert_allclose(np.asarray(ours[name]),
                                   _nhwc(refs[name]), **TOL,
                                   err_msg=name)


def test_rpn_head_parity():
    from detectron2.modeling.proposal_generator.rpn import \
        StandardRPNHead

    from pvo_tpu.vps.rpn import LEVELS, RPNHead

    ref = _randomize(StandardRPNHead(in_channels=256, num_anchors=3),
                     3).eval()
    rng = np.random.RandomState(4)
    feats = {lvl: rng.randn(1, 8 // (1 + i % 2) + 2, 10, 256)
             .astype(np.float32) for i, lvl in enumerate(LEVELS)}
    tfeats = [torch.from_numpy(np.transpose(feats[lvl], (0, 3, 1, 2)))
              for lvl in LEVELS]
    with torch.no_grad():
        rlogits, rdeltas = ref(tfeats)

    sd = {f"proposal_generator.rpn_head.{k}": v.numpy()
          for k, v in ref.state_dict().items()}
    params = {"params": cv.convert_rpn(sd)}
    logits, deltas = RPNHead().apply(
        params, {k: jnp.asarray(v) for k, v in feats.items()})
    for i, lvl in enumerate(LEVELS):
        np.testing.assert_allclose(
            np.asarray(logits[lvl]), _nhwc(rlogits[i]), **TOL)
        got = np.asarray(deltas[lvl])
        np.testing.assert_allclose(
            got, _nhwc(rdeltas[i]).reshape(got.shape), **TOL)


def test_box_and_mask_head_parity():
    from detectron2.layers import ShapeSpec
    from detectron2.modeling.box_regression import Box2BoxTransform
    from detectron2.modeling.roi_heads.box_head import FastRCNNConvFCHead
    from detectron2.modeling.roi_heads.fast_rcnn import \
        FastRCNNOutputLayers
    from detectron2.modeling.roi_heads.mask_head import \
        MaskRCNNConvUpsampleHead

    from pvo_tpu.vps.roi_heads import BoxHead, MaskHead

    head = _randomize(FastRCNNConvFCHead(
        ShapeSpec(channels=256, height=7, width=7), conv_dims=[],
        fc_dims=[1024, 1024]), 5).eval()
    pred = _randomize(FastRCNNOutputLayers(
        ShapeSpec(channels=1024),
        box2box_transform=Box2BoxTransform((10., 10., 5., 5.)),
        num_classes=3), 6).eval()
    mask = _randomize(MaskRCNNConvUpsampleHead(
        ShapeSpec(channels=256, height=14, width=14), num_classes=3,
        conv_dims=[256, 256, 256, 256, 256]), 7).eval()

    sd = {}
    sd.update({f"roi_heads.box_head.{k}": v.numpy()
               for k, v in head.state_dict().items()})
    sd.update({f"roi_heads.box_predictor.{k}": v.numpy()
               for k, v in pred.state_dict().items()})
    sd.update({f"roi_heads.mask_head.{k}": v.numpy()
               for k, v in mask.state_dict().items()})
    conv = cv.convert_roi_heads(sd)

    rng = np.random.RandomState(6)
    pooled = rng.randn(4, 7, 7, 256).astype(np.float32)
    with torch.no_grad():
        z = head(torch.from_numpy(np.transpose(pooled, (0, 3, 1, 2))))
        rscores, rdeltas = pred(z)

    # torch flattens NCHW (C,7,7); our converter keeps torch's fc1
    # layout, so feed the NCHW flattening order
    scores, deltas = BoxHead(3).apply(
        {"params": conv["box_head"]},
        jnp.asarray(np.transpose(pooled, (0, 3, 1, 2)).reshape(4, -1)))
    np.testing.assert_allclose(np.asarray(scores),
                               rscores.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(deltas),
                               rdeltas.numpy(), **TOL)

    mp = rng.randn(2, 14, 14, 256).astype(np.float32)
    with torch.no_grad():
        rlogits = mask.layers(torch.from_numpy(
            np.transpose(mp, (0, 3, 1, 2))))
    ours = MaskHead(3).apply({"params": conv["mask_head"]},
                             jnp.asarray(mp))
    np.testing.assert_allclose(np.asarray(ours), _nhwc(rlogits),
                               rtol=1e-3, atol=1e-3)


def test_semseg_head_parity():
    from detectron2.layers import ShapeSpec
    from detectron2.modeling.meta_arch.semantic_seg import SemSegFPNHead

    from pvo_tpu.vps.semseg import SemSegFPNHead as Ours

    shapes = {
        "p2": ShapeSpec(channels=256, stride=4),
        "p3": ShapeSpec(channels=256, stride=8),
        "p4": ShapeSpec(channels=256, stride=16),
        "p5": ShapeSpec(channels=256, stride=32),
    }
    ref = _randomize(SemSegFPNHead(
        shapes, num_classes=12, conv_dims=128, common_stride=4,
        norm="GN"), 8).eval()

    rng = np.random.RandomState(8)
    H, W = 64, 96
    feats = {lvl: rng.randn(1, H // s, W // s, 256).astype(np.float32)
             for lvl, s in (("p2", 4), ("p3", 8), ("p4", 16),
                            ("p5", 32))}
    tfeats = {lvl: torch.from_numpy(np.transpose(v, (0, 3, 1, 2)))
              for lvl, v in feats.items()}
    with torch.no_grad():
        rlogits, _ = ref(tfeats)

    sd = {f"sem_seg_head.{k}": v.numpy()
          for k, v in ref.state_dict().items()}
    params = {"params": cv.convert_semseg(sd)}
    ours = Ours(12).apply(params,
                          {k: jnp.asarray(v) for k, v in feats.items()},
                          (H, W))
    np.testing.assert_allclose(np.asarray(ours), _nhwc(rlogits),
                               rtol=2e-3, atol=2e-3)
