"""ResNet-50 backbone with frozen batch-norm, NHWC flax.

Rebuild of the detectron2 ResNet used by Panoptic FPN (reference
VPS_Module/detectron2/modeling/backbone/resnet.py:362): conv7x7/2 stem +
3x3/2 maxpool, bottleneck stages res2..res5 (3/4/6/3 blocks). BatchNorm
is frozen at inference (detectron2 FrozenBatchNorm2d): we keep the four
torch buffers as parameters and fold them into one affine at call time,
so weight conversion is 1:1.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from pvo_tpu.vo.net.layers import Conv


class FrozenBN(nn.Module):
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        shape = (self.features,)
        weight = self.param("weight", nn.initializers.ones, shape)
        bias = self.param("bias", nn.initializers.zeros, shape)
        mean = self.param("running_mean", nn.initializers.zeros, shape)
        var = self.param("running_var", nn.initializers.ones, shape)
        scale = weight / jnp.sqrt(var + self.eps)
        return x * scale + (bias - mean * scale)


class Bottleneck(nn.Module):
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    has_shortcut: bool = False

    @nn.compact
    def __call__(self, x):
        # detectron2 puts the stride on conv1 (stride_in_1x1=True for
        # caffe-style R50, the PanopticFPN default)
        y = Conv(self.bottleneck_channels, 1, self.stride, padding=0,
                 use_bias=False, name="conv1")(x)
        y = FrozenBN(self.bottleneck_channels, name="conv1_norm")(y)
        y = nn.relu(y)
        y = Conv(self.bottleneck_channels, 3, 1, use_bias=False,
                 name="conv2")(y)
        y = FrozenBN(self.bottleneck_channels, name="conv2_norm")(y)
        y = nn.relu(y)
        y = Conv(self.out_channels, 1, 1, padding=0, use_bias=False,
                 name="conv3")(y)
        y = FrozenBN(self.out_channels, name="conv3_norm")(y)

        if self.has_shortcut:
            x = Conv(self.out_channels, 1, self.stride, padding=0,
                     use_bias=False, name="shortcut")(x)
            x = FrozenBN(self.out_channels, name="shortcut_norm")(x)
        return nn.relu(x + y)


def _max_pool(x, k, s, pad):
    return nn.max_pool(x, (k, k), strides=(s, s),
                       padding=((pad, pad), (pad, pad)))


class ResNet50(nn.Module):
    """Returns {"res2": ..., "res3": ..., "res4": ..., "res5": ...}."""
    stage_blocks: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x):
        x = Conv(64, 7, 2, padding=3, use_bias=False,
                 name="stem_conv1")(x)
        x = FrozenBN(64, name="stem_conv1_norm")(x)
        x = nn.relu(x)
        x = _max_pool(x, 3, 2, 1)

        out = {}
        channels = [(256, 64), (512, 128), (1024, 256), (2048, 512)]
        for stage, (n_blocks, (oc, bc)) in enumerate(
                zip(self.stage_blocks, channels)):
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                x = Bottleneck(
                    oc, bc, stride=stride if b == 0 else 1,
                    has_shortcut=(b == 0),
                    name=f"res{stage + 2}_{b}")(x)
            out[f"res{stage + 2}"] = x
        return out
