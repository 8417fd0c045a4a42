"""YUV420 frame ingest: halve the per-frame h2d bytes.

Camera pipelines and video decoders emit YUV420 natively; accepting it
as the upload format cuts the tracking loop's dominant host->device
transfer from 3 bytes/px to 1.5 bytes/px. Through a remote-relay link
(~20-30 MB/s effective, docs/PERF.md) that is ~12-15 ms of stream time
per 240x808 frame; on real PCIe it is still half the DMA traffic.

Host side packs RGB -> planar YUV420 (BT.601 full-range, 2x2 chroma
mean); the device side reconstructs uint8 RGB inside the track kernel
(nearest chroma upsample + inverse matrix, a ~0.5 ms VPU epilogue).
Round-trip error is bounded by chroma subsampling (tested in
tests/test_utils.py); the rest of the pipeline (normalize -> encoders,
reference droid_net.py:326-334) is unchanged and sees ordinary uint8
RGB. Disable with VOConfig(yuv420_upload=False) for bit-exact RGB
ingest.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def rgb_to_yuv420(img):
    """(H, W, 3) uint8 RGB -> (H*W*3//2,) uint8 planar YUV420.

    H and W must be even. BT.601 full-range; chroma is the mean of
    each 2x2 block.
    """
    H, W = img.shape[:2]
    assert H % 2 == 0 and W % 2 == 0, (H, W)
    from pvo_tpu import native
    packed = native.rgb_to_yuv420(img)
    if packed is not None:     # C packer (~7x the numpy throughput)
        return packed
    f = img.astype(np.float32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 + (b - y) * (1.0 / 1.772)
    cr = 128.0 + (r - y) * (1.0 / 1.402)
    cb = cb.reshape(H // 2, 2, W // 2, 2).mean((1, 3))
    cr = cr.reshape(H // 2, 2, W // 2, 2).mean((1, 3))
    out = np.empty(H * W + 2 * (H // 2) * (W // 2), np.uint8)
    np.clip(np.rint(y), 0, 255, out=y)
    out[:H * W] = y.reshape(-1).astype(np.uint8)
    o = H * W
    q = (H // 2) * (W // 2)
    out[o:o + q] = np.clip(np.rint(cb), 0, 255).reshape(-1) \
        .astype(np.uint8)
    out[o + q:] = np.clip(np.rint(cr), 0, 255).reshape(-1) \
        .astype(np.uint8)
    return out


def yuv420_to_rgb(packed, H, W):
    """(H*W*3//2,) uint8 planar YUV420 -> (H, W, 3) uint8 RGB (jnp).

    Nearest chroma upsample + BT.601 inverse, traced inside the track
    kernel.
    """
    hw = H * W
    q = (H // 2) * (W // 2)
    y = packed[:hw].reshape(H, W).astype(jnp.float32)
    cb = packed[hw:hw + q].reshape(H // 2, W // 2).astype(jnp.float32)
    cr = packed[hw + q:].reshape(H // 2, W // 2).astype(jnp.float32)
    cb = jnp.repeat(jnp.repeat(cb, 2, 0), 2, 1) - 128.0
    cr = jnp.repeat(jnp.repeat(cr, 2, 0), 2, 1) - 128.0
    r = y + 1.402 * cr
    b = y + 1.772 * cb
    g = (y - 0.299 * r - 0.114 * b) * (1.0 / 0.587)
    rgb = jnp.stack([r, g, b], -1)
    return jnp.clip(jnp.rint(rgb), 0, 255).astype(jnp.uint8)
