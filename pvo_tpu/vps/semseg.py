"""Semantic segmentation FPN head, NHWC flax.

Rebuild of detectron2's SemSegFPNHead (reference VPS_Module/detectron2/
modeling/meta_arch/semantic_seg.py:136): per-level scale heads
(conv3x3 + GroupNorm + ReLU, with x2 bilinear upsampling per step down
to common stride 4), summed, 1x1 predictor, then x4 upsample to image
resolution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from pvo_tpu.vo.net.layers import Conv

LEVELS = ("p2", "p3", "p4", "p5")
STRIDES = (4, 8, 16, 32)
COMMON_STRIDE = 4


def upsample2x_bilinear(x):
    """Torch F.interpolate(scale_factor=2, bilinear,
    align_corners=False) equivalent."""
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, 2 * H, 2 * W, C), "bilinear")


class SemSegFPNHead(nn.Module):
    num_classes: int = 12   # vkitti stuff classes (11) + other
    conv_dim: int = 128

    @nn.compact
    def __call__(self, feats, out_hw):
        total = None
        for lvl, stride in zip(LEVELS, STRIDES):
            x = feats[lvl]
            # head_length = max(1, log2(stride / common_stride))
            k = max(1, (stride // COMMON_STRIDE).bit_length() - 1)
            for i in range(k):
                x = Conv(self.conv_dim, 3, use_bias=False,
                         name=f"{lvl}_conv{i}")(x)
                x = nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                 name=f"{lvl}_norm{i}")(x)
                x = nn.relu(x)
                if stride > COMMON_STRIDE:
                    x = upsample2x_bilinear(x)
                    stride //= 2
            total = x if total is None else total + x

        logits = Conv(self.num_classes, 1, padding=0,
                      name="predictor")(total)
        B, _, _, C = logits.shape
        return jax.image.resize(logits, (B,) + tuple(out_hw) + (C,),
                                "bilinear")
