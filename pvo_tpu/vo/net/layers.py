"""Shared layers: torch-compatible convs/norms and gradient clipping.

Channels-last (NHWC) throughout — the TPU-native layout. Convolutions use
explicit symmetric padding so spatial alignment matches the reference's
torch convs exactly (needed for weight-transfer parity); norms replicate
torch defaults (InstanceNorm2d: no affine, eps=1e-5, biased variance).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch nn.init.kaiming_normal_(mode='fan_out', nonlinearity='relu')
kaiming_out = jax.nn.initializers.variance_scaling(
    2.0, "fan_out", "normal")


class Conv(nn.Module):
    """2D conv with torch-style explicit padding, NHWC."""
    features: int
    kernel: int = 3
    stride: int = 1
    padding: int | None = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if pad is None:
            pad = self.kernel // 2
        return nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            use_bias=self.use_bias,
            kernel_init=kaiming_out,
        )(x)


def instance_norm(x, eps=1e-5):
    """InstanceNorm2d, affine=False (torch default): normalize each
    (sample, channel) over H, W with biased variance."""
    mean = jnp.mean(x, axis=(-3, -2), keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=(-3, -2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class GroupNorm(nn.Module):
    """GroupNorm with torch-compatible affine params and eps."""
    num_groups: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=self.num_groups,
                            epsilon=self.eps)(x)


def make_norm(norm_fn: str, channels: int) -> Callable:
    if norm_fn == "group":
        gn = GroupNorm(num_groups=channels // 8)
        return gn
    if norm_fn == "instance":
        return instance_norm
    if norm_fn == "none":
        return lambda x: x
    raise NotImplementedError(
        f"norm_fn={norm_fn!r} (batch-norm is not used by any PVO model; "
        "the reference defaults it only for unused configs)")


@jax.custom_vjp
def grad_clip(x, clip=0.01):
    """Identity forward; backward zeroes grads with |g|>clip or NaN
    (reference modules/clipping.py:7-24)."""
    return x


def _grad_clip_fwd(x, clip):
    return x, clip


def _grad_clip_bwd(clip, g):
    bad = jnp.isnan(g) | (jnp.abs(g) > clip)
    return (jnp.where(bad, jnp.zeros_like(g), g), None)


grad_clip.defvjp(_grad_clip_fwd, _grad_clip_bwd)


class ConvSeq(nn.Module):
    """Conv -> ReLU -> Conv (the common 2-layer head body)."""
    widths: Sequence[int]
    kernels: Sequence[int]

    @nn.compact
    def __call__(self, x):
        for i, (w, k) in enumerate(zip(self.widths, self.kernels)):
            x = Conv(w, k, name=f"conv{i}")(x)
            if i + 1 < len(self.widths):
                x = nn.relu(x)
        return x
