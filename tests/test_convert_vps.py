"""Structural test for the detectron2 -> flax Panoptic FPN converter:
generate a synthetic detectron2-named state dict shaped to match our
model, convert it, and check the tree loads exactly (same treedef and
leaf shapes as model.init) and that values land where expected."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvo_tpu.utils.convert_vps import convert_panoptic_fpn
from pvo_tpu.vps.panoptic_fpn import PanopticFPN


def synth_detectron2_sd(rng):
    sd = {}

    def conv(t, cin, cout, k, bias=True):
        sd[f"{t}.weight"] = rng.randn(cout, cin, k, k).astype(np.float32)
        if bias:
            sd[f"{t}.bias"] = rng.randn(cout).astype(np.float32)

    def bn(t, c):
        for suffix in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{t}.{suffix}"] = rng.rand(c).astype(np.float32) + 0.5

    def dense(t, cin, cout):
        sd[f"{t}.weight"] = rng.randn(cout, cin).astype(np.float32)
        sd[f"{t}.bias"] = rng.randn(cout).astype(np.float32)

    bu = "backbone.bottom_up"
    conv(f"{bu}.stem.conv1", 3, 64, 7, bias=False)
    bn(f"{bu}.stem.conv1.norm", 64)
    chans = [(64, 256, 64), (256, 512, 128), (512, 1024, 256),
             (1024, 2048, 512)]
    for stage, (n_blocks, (cin, cout, cb)) in enumerate(
            zip((3, 4, 6, 3), chans)):
        for b in range(n_blocks):
            base = f"{bu}.res{stage + 2}.{b}"
            c_in = cin if b == 0 else cout
            conv(f"{base}.conv1", c_in, cb, 1, bias=False)
            bn(f"{base}.conv1.norm", cb)
            conv(f"{base}.conv2", cb, cb, 3, bias=False)
            bn(f"{base}.conv2.norm", cb)
            conv(f"{base}.conv3", cb, cout, 1, bias=False)
            bn(f"{base}.conv3.norm", cout)
            if b == 0:
                conv(f"{base}.shortcut", c_in, cout, 1, bias=False)
                bn(f"{base}.shortcut.norm", cout)

    for lvl, cin in zip((2, 3, 4, 5), (256, 512, 1024, 2048)):
        conv(f"backbone.fpn_lateral{lvl}", cin, 256, 1)
        conv(f"backbone.fpn_output{lvl}", 256, 256, 3)

    conv("proposal_generator.rpn_head.conv", 256, 256, 3)
    conv("proposal_generator.rpn_head.objectness_logits", 256, 3, 1)
    conv("proposal_generator.rpn_head.anchor_deltas", 256, 12, 1)

    dense("roi_heads.box_head.fc1", 256 * 49, 1024)
    dense("roi_heads.box_head.fc2", 1024, 1024)
    dense("roi_heads.box_predictor.cls_score", 1024, 4)
    dense("roi_heads.box_predictor.bbox_pred", 1024, 12)
    for i in range(1, 5):
        conv(f"roi_heads.mask_head.mask_fcn{i}", 256, 256, 3)
    sd["roi_heads.mask_head.deconv.weight"] = rng.randn(
        256, 256, 2, 2).astype(np.float32)
    sd["roi_heads.mask_head.deconv.bias"] = rng.randn(
        256).astype(np.float32)
    conv("roi_heads.mask_head.predictor", 256, 3, 1)

    for lvl, k in zip(("p2", "p3", "p4", "p5"), (1, 1, 2, 3)):
        cin = 256
        for i in range(k):
            t = f"sem_seg_head.{lvl}.{2 * i}"
            conv(t, cin, 128, 3, bias=False)
            sd[f"{t}.norm.weight"] = rng.rand(128).astype(np.float32)
            sd[f"{t}.norm.bias"] = rng.rand(128).astype(np.float32)
            cin = 128
    conv("sem_seg_head.predictor", 128, 12, 1)
    conv("fusion_conv1", 512, 256, 3)
    return sd


@pytest.mark.slow
def test_converted_tree_matches_init():
    rng = np.random.RandomState(0)
    sd = synth_detectron2_sd(rng)
    converted = convert_panoptic_fpn(sd)

    model = PanopticFPN()
    x = jnp.zeros((1, 64, 96, 3))
    ref = model.init(jax.random.PRNGKey(0), x)

    ref_flat = jax.tree_util.tree_flatten_with_path(ref)[0]
    conv_flat = jax.tree_util.tree_flatten_with_path(converted)[0]
    ref_map = {jax.tree_util.keystr(p): np.shape(v)
               for p, v in ref_flat}
    conv_map = {jax.tree_util.keystr(p): np.shape(v)
                for p, v in conv_flat}
    missing = set(ref_map) - set(conv_map)
    extra = set(conv_map) - set(ref_map)
    assert not missing, sorted(missing)[:8]
    assert not extra, sorted(extra)[:8]
    bad = [k for k in ref_map if ref_map[k] != conv_map[k]]
    assert not bad, [(k, ref_map[k], conv_map[k]) for k in bad[:5]]

    # converted params actually run
    sem, dets = model.apply(converted, x, max_dets=5)
    assert sem.shape == (1, 64, 96, 12)
