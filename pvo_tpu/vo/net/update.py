"""Dynamic update operator: heads + graph aggregation, NHWC flax.

Rebuild of the reference DynamicUpdateModule / GraphAgg
(VO_Module/droid_slam/droid_net.py:64-95, 166-314): a ConvGRU updates a
per-edge hidden state from correlation + motion features, then four heads
predict camera-flow delta, dynamic-flow delta, confidence logits, and a
dynamic-mask logit delta. GraphAgg mean-pools hidden states over edges
sharing a source frame and produces per-frame BA damping (eta) and the
8x8x9 convex-upsampling mask.

TPU deltas vs the reference:
  * edges are a flat leading batch dim (E, H, W, C) — no (B, N) split;
  * scatter_mean is a pair of XLA segment_sums keyed by the (padded)
    source-frame id, so padded edges fall into a dead segment;
  * all heads run in one jit, bf16-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .gru import ConvGRU
from .layers import Conv, grad_clip

CORR_PLANES = 4 * (2 * 3 + 1) ** 2  # 4 levels x 7x7 window = 196
MASK_NUM = 2


class _Head(nn.Module):
    out: int
    clip: float = 0.01

    @nn.compact
    def __call__(self, x):
        x = nn.relu(Conv(128, 3, name="conv0")(x))
        x = Conv(self.out, 3, name="conv1")(x)
        return grad_clip(x, self.clip)


class GraphAgg(nn.Module):
    """Per-frame aggregation of edge hidden states.

    ``seg_ids``: (E,) int ids mapping each edge to its source-frame slot
    in [0, num_frames); padded edges must carry id == num_frames (dropped).
    Returns (eta (F,H,W,1), upmask (F,H,W,576)).

    Split into :meth:`pre` (per-edge conv) and :meth:`post` (per-frame
    convs + heads) so the streaming backend can accumulate the
    segment-sum across edge CHUNKS without holding every edge's
    activation at once (the role of the reference's 8-edge chunking in
    update_lowmem, factor_graph.py:310-360).
    """

    def setup(self):
        self.conv1 = Conv(128, 3, name="conv1")
        self.conv2 = Conv(128, 3, name="conv2")
        self.eta_conv = Conv(1, 3, name="eta")
        self.upmask_conv = Conv(8 * 8 * 9, 1, padding=0,
                                name="upmask_disp")

    def pre(self, net):
        """Per-edge conv before the scatter-mean. (E,H,W,128)."""
        return nn.relu(self.conv1(net))

    def post(self, mean):
        """Per-frame tail on the scatter-MEANed activations."""
        y = nn.relu(self.conv2(mean))
        eta = self.eta_conv(y)
        eta = 0.01 * nn.softplus(grad_clip(eta))
        upmask = self.upmask_conv(y)
        return eta, upmask

    def __call__(self, net, seg_ids, num_frames):
        E, H, W, C = net.shape
        x = self.pre(net)

        # scatter-mean as a one-hot MXU matmul with fp32 accumulation
        # (bf16 accumulation over E edges drifts; jax.ops.segment_sum
        # lowers to a sequential scatter loop costing ~1.3 ms/call at
        # tracking shapes, utils/mxu.py)
        from pvo_tpu.utils.mxu import segment_sum_mm
        ones = jnp.ones((E,), jnp.float32)
        summed = segment_sum_mm(x.reshape(E, -1), seg_ids,
                                num_frames + 1)
        counts = jax.ops.segment_sum(ones, seg_ids,
                                     num_segments=num_frames + 1)
        mean = summed[:num_frames] / jnp.maximum(
            counts[:num_frames, None], 1.0)
        mean = mean.reshape(num_frames, H, W, 128).astype(x.dtype)
        return self.post(mean)


class DynamicUpdateModule(nn.Module):
    """The PVO update operator (4 heads + dynamic mask)."""
    use_aff_bri: bool = False

    @nn.compact
    def __call__(self, net, inp, corr, motion, ctx_pre=None):
        """All inputs (E, H, W, C): hidden 128, context 128, corr 196,
        motion 8 (= cam_flow 2 + full_flow 2 + residual 2 + mask 2).

        ``ctx_pre``: optional precomputed GRU gate contributions of the
        context features (constant across a keyframe's update
        iterations). When set, ``inp`` is ignored (may be None) and the
        param tree's GRU kernels must be the ctx-sliced variant (see
        factor_graph.split_gru_ctx_params).

        Returns dict with: net, delta (cam 2), delta_dy (2),
        weight_logits (2), delta_mask (2), and (if use_aff_bri)
        aff_params (E, 2).
        """
        c = nn.relu(Conv(128, 1, padding=0, name="corr_enc0")(corr))
        c = nn.relu(Conv(128, 3, name="corr_enc1")(c))

        f = nn.relu(Conv(128, 7, padding=3, name="flow_enc0")(motion))
        f = nn.relu(Conv(64, 3, name="flow_enc1")(f))

        if ctx_pre is not None:
            inp_all = jnp.concatenate([c, f], axis=-1)
            net = ConvGRU(128, name="gru")(net, inp_all, pre=ctx_pre)
        else:
            inp_all = jnp.concatenate([inp, c, f], axis=-1)
            net = ConvGRU(128, name="gru")(net, inp_all)

        out = {
            "net": net,
            "delta": _Head(2, name="delta")(net),
            "delta_dy": _Head(2, name="delta_dy")(net),
            "weight_logits": _Head(2, name="weight")(net),
            "delta_mask": _Head(MASK_NUM, name="delta_mask")(net),
        }
        if self.use_aff_bri:
            g = nn.relu(Conv(128, 3, name="aff_conv")(net))
            g = grad_clip(jnp.mean(g, axis=(-3, -2)))
            out["aff_params"] = nn.sigmoid(
                nn.Dense(2, name="aff_linear")(g))
        return out


class UpdateModule(nn.Module):
    """Plain (non-dynamic) DROID update operator
    (reference droid_net.py:98-163) — kept for the vanilla-VO model
    family and motion filtering without dynamic masks."""

    @nn.compact
    def __call__(self, net, inp, corr, motion):
        c = nn.relu(Conv(128, 1, padding=0, name="corr_enc0")(corr))
        c = nn.relu(Conv(128, 3, name="corr_enc1")(c))
        f = nn.relu(Conv(128, 7, padding=3, name="flow_enc0")(motion))
        f = nn.relu(Conv(64, 3, name="flow_enc1")(f))
        inp_all = jnp.concatenate([inp, c, f], axis=-1)
        net = ConvGRU(128, name="gru")(net, inp_all)
        delta = _Head(2, name="delta")(net)
        w = _Head(2, name="weight")(net)
        return {"net": net, "delta": delta,
                "weight": nn.sigmoid(w)}
