"""ConvGRU with gated global context, NHWC flax.

Rebuild of the reference ConvGRU (VO_Module/droid_slam/modules/gru.py):
a 3x3 convolutional GRU whose z/r/q gates each receive an additive global
term — the sigmoid-gated spatial mean of the hidden state passed through
1x1 convs. On TPU the 1x1 "global" convs on a 1x1 map are just (C,C)
matmuls fused by XLA.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv


class ConvGRU(nn.Module):
    hidden: int = 128

    @nn.compact
    def __call__(self, net, inp, pre=None):
        """net: (B,H,W,hidden) hidden state; inp: (B,H,W,I) input
        features (already concatenated). Returns the new hidden state.

        ``pre``: optional (pz, pr, pq) additive gate contributions from
        input channels NOT present in ``inp`` — the caller applied the
        corresponding kernel slices once OUTSIDE the recurrent loop
        (the context features are constant across a keyframe's update
        iterations; conv linearity makes the split exact). When set,
        the stored convz/convr/convq kernels must already be sliced to
        match [net, inp]'s channel count (see
        factor_graph.split_gru_ctx_params)."""
        net_inp = jnp.concatenate([net, inp], axis=-1)

        # global context: gated mean over space, (B,1,1,C)
        glo = nn.sigmoid(Conv(self.hidden, 1, padding=0, name="w")(net))
        glo = jnp.mean(glo * net, axis=(-3, -2), keepdims=True)

        z_l = (Conv(self.hidden, 3, name="convz")(net_inp) +
               Conv(self.hidden, 1, padding=0, name="convz_glo")(glo))
        r_l = (Conv(self.hidden, 3, name="convr")(net_inp) +
               Conv(self.hidden, 1, padding=0, name="convr_glo")(glo))
        if pre is not None:
            z_l = z_l + pre[0]
            r_l = r_l + pre[1]
        z = nn.sigmoid(z_l)
        r = nn.sigmoid(r_l)
        q_l = (Conv(self.hidden, 3, name="convq")(
                   jnp.concatenate([r * net, inp], axis=-1)) +
               Conv(self.hidden, 1, padding=0, name="convq_glo")(glo))
        if pre is not None:
            q_l = q_l + pre[2]
        q = nn.tanh(q_l)

        return (1 - z) * net + z * q
