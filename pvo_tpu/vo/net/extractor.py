"""RAFT-style residual feature encoders, NHWC flax.

Rebuild of the reference BasicEncoder
(VO_Module/droid_slam/modules/extractor.py:118-198): 7x7 stride-2 stem,
three 2-block residual stages (32/64/128 channels, strides 1/2/2) to 1/8
resolution, 1x1 output conv. PVO uses two instances: fnet (128-d,
instance norm) and cnet (256-d, no norm) — droid_net.py:320-321.

TPU notes: channels-last, bf16-friendly (norms computed in fp32), weights
transferable from the reference checkpoints via
pvo_tpu.utils.convert (OIHW->HWIO).
"""

from __future__ import annotations

from flax import linen as nn

from .layers import Conv, instance_norm, make_norm

DIM = 32


class ResidualBlock(nn.Module):
    planes: int
    norm_fn: str = "instance"
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        norm1 = make_norm(self.norm_fn, self.planes)
        norm2 = make_norm(self.norm_fn, self.planes)

        y = Conv(self.planes, 3, self.stride, name="conv1")(x)
        y = nn.relu(norm1(y))
        y = Conv(self.planes, 3, 1, name="conv2")(y)
        y = nn.relu(norm2(y))

        if self.stride != 1 or x.shape[-1] != self.planes:
            norm3 = make_norm(self.norm_fn, self.planes)
            x = Conv(self.planes, 1, self.stride, padding=0,
                     name="downsample")(x)
            x = norm3(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    output_dim: int = 128
    norm_fn: str = "instance"

    @nn.compact
    def __call__(self, x):
        """x: (..., H, W, 3) normalized images -> (..., H/8, W/8, out)."""
        lead = x.shape[:-3]
        H, W, C = x.shape[-3:]
        x = x.reshape((-1, H, W, C))

        x = Conv(DIM, 7, 2, padding=3, name="conv1")(x)
        if self.norm_fn == "instance":
            x = instance_norm(x)
        elif self.norm_fn == "group":
            x = make_norm("group", DIM)(x)
        x = nn.relu(x)

        for stage, (dim, stride) in enumerate(
                [(DIM, 1), (2 * DIM, 2), (4 * DIM, 2)]):
            x = ResidualBlock(dim, self.norm_fn, stride,
                              name=f"layer{stage + 1}_0")(x)
            x = ResidualBlock(dim, self.norm_fn, 1,
                              name=f"layer{stage + 1}_1")(x)

        x = Conv(self.output_dim, 1, 1, padding=0, name="conv2")(x)
        return x.reshape(lead + x.shape[1:])
