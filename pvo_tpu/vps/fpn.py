"""Feature Pyramid Network on ResNet features, NHWC flax.

Rebuild of detectron2's FPN (reference VPS_Module/detectron2/modeling/
backbone/fpn.py:17): 1x1 lateral convs, nearest top-down x2 upsampling,
3x3 output convs, plus LastLevelMaxPool producing p6.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from pvo_tpu.vo.net.layers import Conv


def upsample2x_nearest(x):
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :],
                         (B, H, 2, W, 2, C))
    return x.reshape(B, 2 * H, 2 * W, C)


class FPN(nn.Module):
    out_channels: int = 256

    @nn.compact
    def __call__(self, feats):
        """feats: dict res2..res5 (NHWC). Returns dict p2..p6."""
        names = ["res2", "res3", "res4", "res5"]
        laterals = [
            Conv(self.out_channels, 1, padding=0,
                 name=f"lateral{i + 2}")(feats[n])
            for i, n in enumerate(names)]

        # top-down pathway
        tds = [laterals[-1]]
        for lat in laterals[-2::-1]:
            td = upsample2x_nearest(tds[-1])
            # crop in case of odd input sizes
            td = td[:, :lat.shape[1], :lat.shape[2]]
            tds.append(lat + td)
        tds = tds[::-1]  # p2..p5 order

        out = {}
        for i, td in enumerate(tds):
            out[f"p{i + 2}"] = Conv(self.out_channels, 3,
                                    name=f"output{i + 2}")(td)
        # LastLevelMaxPool: stride-2 subsample of p5
        out["p6"] = nn.max_pool(out["p5"], (1, 1), strides=(2, 2))
        return out
