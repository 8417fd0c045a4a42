"""Panoptic FPN meta-architecture with flow-guided feature fusion.

Rebuild of the reference PanopticFPN (VPS_Module/detectron2/modeling/
meta_arch/panoptic_fpn.py:35-494): ResNet-50 + FPN backbone, semantic
head, RPN, ROI heads, panoptic combination with the vkitti id scheme
(cat*10000 + instance), and the PVO fusion mode — reference-frame FPN
features forward-splatted by VO flow (optionally depth-ordered),
concatenated with the current features and fused through a 3x3 conv
(512 -> 256) before the heads.

TPU design: the whole dense path (backbone -> heads -> NMS'd fixed-size
detections + semantic logits) is one jitted function; the per-image
panoptic stitching (sequential segment id assignment) is lightweight
host numpy, exactly the part the reference also ran on CPU.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from pvo_tpu.vo.net.layers import Conv

from . import categories as C
from .fpn import FPN
from .resnet import ResNet50
from .roi_heads import ROIHeads
from .rpn import RPNHead, generate_proposals
from .semseg import SemSegFPNHead

PIXEL_MEAN = np.array([103.530, 116.280, 123.675], np.float32)  # BGR
PIXEL_STD = np.array([1.0, 1.0, 1.0], np.float32)


class PanopticFPN(nn.Module):
    num_thing_classes: int = C.NUM_THING_CLASSES
    num_semseg_classes: int = C.NUM_SEMSEG_CLASSES
    fusion_alpha: float = 1.0
    # R-50 stage depths; tests shrink this to bound compile time
    backbone_blocks: tuple = (3, 4, 6, 3)

    def setup(self):
        self.backbone = ResNet50(stage_blocks=self.backbone_blocks)
        self.fpn = FPN()
        self.rpn_head = RPNHead()
        self.roi_heads = ROIHeads(self.num_thing_classes)
        self.sem_seg_head = SemSegFPNHead(self.num_semseg_classes)
        # PVO fusion conv (panoptic_fpn.py:75-100): 512 -> 256
        self.fusion_conv1 = Conv(256, 3, name="fusion_conv1")

    def features(self, images_bgr):
        """images_bgr: (B, H, W, 3) float BGR (0..255). Normalization
        constants follow the input dtype so a bf16 caller stays bf16
        (f32 numpy constants would promote the whole backbone)."""
        mean = jnp.asarray(PIXEL_MEAN, images_bgr.dtype)
        std = jnp.asarray(PIXEL_STD, images_bgr.dtype)
        x = (images_bgr - mean) / std
        return self.fpn(self.backbone(x))

    def fuse(self, feats_cur, feats_warp):
        """Concat current + alpha * warped-ref features, fuse 512->256
        (reference fusion_module + flow_transport cat)."""
        out = {}
        for k in feats_cur:
            cat = jnp.concatenate(
                [feats_cur[k], self.fusion_alpha * feats_warp[k]],
                axis=-1)
            out[k] = self.fusion_conv1(cat)
        return out

    def heads(self, feats, image_hw, max_dets=100):
        sem_logits = self.sem_seg_head(feats, image_hw)
        obj_logits, anchor_deltas = self.rpn_head(feats)
        # single-image proposals (B=1)
        lg = {k: v[0] for k, v in obj_logits.items()}
        rg = {k: v[0] for k, v in anchor_deltas.items()}
        proposals, pscores, pvalid = generate_proposals(
            lg, rg, image_hw)
        dets = self.roi_heads(feats, proposals, pvalid, image_hw,
                              max_dets=max_dets)
        return sem_logits, dets

    def __call__(self, images_bgr, feats_warp=None, max_dets=100):
        """Full inference for ONE image (B=1).

        feats_warp: optional dict of flow-warped reference FPN features
        (fusion mode). Returns (sem_logits (1,H,W,S), detections)."""
        H, W = images_bgr.shape[1:3]
        feats = self.features(images_bgr)
        if feats_warp is not None:
            feats = self.fuse(feats, feats_warp)
        elif self.is_initializing():
            # touch the fusion conv so its params exist even when
            # initialized through the plain path
            self.fuse(feats, feats)
        return self.heads(feats, (H, W), max_dets=max_dets)


# ---------------- flow transport (device) ----------------


def pose_transport_depth(depth, pose_ref_w2c, pose_cur_w2c,
                         intrinsics):
    """Reproject a reference depth map into the current camera.

    Reference pose_transport_depth (panoptic_fpn.py:388-408): lift
    every reference pixel to a 3D camera point, move it through the
    relative extrinsics cur_w2c @ inv(ref_w2c), and return the
    resulting z as the current-frame depth estimate (still laid out on
    the REFERENCE pixel grid — the caller splats it alongside the
    features, depth_proj_op path).

    depth: (H, W); pose_*_w2c: (4, 4) world-to-camera matrices;
    intrinsics: (fx, fy, cx, cy).
    """
    H, W = depth.shape
    fx, fy, cx, cy = [jnp.asarray(v, jnp.float32) for v in intrinsics]
    u = jnp.arange(W, dtype=jnp.float32)[None, :]
    v = jnp.arange(H, dtype=jnp.float32)[:, None]
    Z = depth.astype(jnp.float32)
    X = (u - cx) / fx * Z
    Y = (v - cy) / fy * Z
    pts = jnp.stack([X, Y, Z, jnp.ones_like(Z)], 0).reshape(4, -1)
    rel = pose_cur_w2c @ jnp.linalg.inv(pose_ref_w2c)
    z1 = (rel @ pts)[2]
    return z1.reshape(H, W)


def _bitcompat_uint16(fl):
    """numpy-style float -> uint16 C-cast (truncate, wrap mod 2^16).

    The reference's npy-flow path does ``flow.astype(np.uint16)``
    before the splat (panoptic_fpn.py:313-314), so NEGATIVE flow
    components wrap to huge offsets and those pixels fall out of
    bounds. Reproduced here for bit-compat replay of reference
    outputs.
    """
    return jnp.bitwise_and(
        jnp.trunc(fl).astype(jnp.int32), 0xFFFF).astype(jnp.float32)


def flow_warp_features(feats: Dict[str, jnp.ndarray], flow,
                       depth=None, bitcompat=False):
    """Forward-splat reference features to the current frame by flow.

    feats: {level: (1, h, w, C)} of the REFERENCE frame; flow: (H, W, 2)
    full-res; depth: optional (H, W) reference depth — when given,
    pixels are written in far-to-near order so near surfaces win
    (reference flow_transport_feature_with_depth + depth_filter,
    panoptic_fpn.py:346-431).

    bitcompat=True replays the reference's npy-flow quirks exactly
    (panoptic_fpn.py:310-344): the flow is resized to each FPN level
    WITHOUT rescaling its pixel values, then C-cast to uint16 —
    negative flows wrap out of bounds and are dropped. Default False
    uses the corrected semantics (values rescaled to level pixels,
    signed truncation).
    """
    H, W = flow.shape[:2]
    out = {}
    for k, f in feats.items():
        h, w, Cc = f.shape[1:]
        fl = jax.image.resize(flow, (h, w, 2), "bilinear")
        if bitcompat:
            # reference keeps full-res pixel values at every level
            fl = _bitcompat_uint16(fl)
        else:
            fl = fl * jnp.array([w / W, h / H], fl.dtype)

        yy, xx = jnp.meshgrid(jnp.arange(h), jnp.arange(w),
                              indexing="ij")
        u1 = (xx + fl[..., 0]).astype(jnp.int32).reshape(-1)
        v1 = (yy + fl[..., 1]).astype(jnp.int32).reshape(-1)
        inb = ((u1 >= 0) & (u1 < w) & (v1 >= 0) & (v1 < h))
        tgt = jnp.where(inb, v1 * w + u1, h * w)

        src = f[0].reshape(h * w, Cc)
        if depth is not None:
            d = jax.image.resize(depth, (h, w), "bilinear").reshape(-1)
            order = jnp.argsort(-d)  # far first; near overwrites
            tgt = tgt[order]
            src = src[order]
        warped = jnp.zeros((h * w + 1, Cc), f.dtype).at[tgt].set(src)
        out[k] = warped[:h * w].reshape(1, h, w, Cc)
    return out


# ---------------- panoptic stitching (host) ----------------


def paste_masks(mask_logits, boxes, out_hw, thresh=0.5):
    """Paste (D, 28, 28) mask logits into full-res boolean masks
    (host numpy; detectron2 paste_masks_in_image semantics)."""
    H, W = out_hw
    D, ms, _ = mask_logits.shape
    out = np.zeros((D, H, W), bool)
    for i in range(D):
        x0, y0, x1, y1 = boxes[i]
        x0i, y0i = int(np.floor(x0)), int(np.floor(y0))
        x1i, y1i = int(np.ceil(x1)), int(np.ceil(y1))
        x0i, y0i = max(x0i, 0), max(y0i, 0)
        x1i, y1i = min(x1i, W), min(y1i, H)
        if x1i <= x0i or y1i <= y0i:
            continue
        # sample the 28x28 logits at pixel centers within the box
        ys = (np.arange(y0i, y1i) + 0.5 - y0) / max(y1 - y0, 1e-6) * ms
        xs = (np.arange(x0i, x1i) + 0.5 - x0) / max(x1 - x0, 1e-6) * ms
        ys = np.clip(ys - 0.5, 0, ms - 1)
        xs = np.clip(xs - 0.5, 0, ms - 1)
        yf, xf = np.floor(ys).astype(int), np.floor(xs).astype(int)
        yc = np.minimum(yf + 1, ms - 1)
        xc = np.minimum(xf + 1, ms - 1)
        wy = (ys - yf)[:, None]
        wx = (xs - xf)[None, :]
        m = mask_logits[i]
        patch = ((1 - wy) * (1 - wx) * m[yf][:, xf] +
                 (1 - wy) * wx * m[yf][:, xc] +
                 wy * (1 - wx) * m[yc][:, xf] +
                 wy * wx * m[yc][:, xc])
        out[i, y0i:y1i, x0i:x1i] = patch > np.log(
            thresh / (1 - thresh))
    return out


def combine_panoptic(dets, sem_seg, overlap_threshold=0.5,
                     stuff_area_thresh=4096,
                     instances_score_thresh=0.5):
    """Stitch instances + semantics into a panoptic id map with the
    vkitti id scheme (reference panoptic_fpn.py:497-588).

    dets: dict of numpy arrays (boxes, scores, classes, mask_logits,
    valid). sem_seg: (H, W) contiguous semantic ids.
    Returns (panoptic (H, W) int32, segments_info list).
    """
    H, W = sem_seg.shape
    pan = np.zeros((H, W), np.int32)
    segments = []

    valid = np.asarray(dets["valid"])
    scores = np.asarray(dets["scores"])
    order = np.argsort(-scores)
    masks = paste_masks(np.asarray(dets["mask_logits"]),
                        np.asarray(dets["boxes"]), (H, W))

    seg_id = 0
    for i in order:
        if not valid[i] or scores[i] < instances_score_thresh:
            continue
        m = masks[i]
        area = int(m.sum())
        if area == 0:
            continue
        inter = int((m & (pan > 0)).sum())
        if inter / area > overlap_threshold:
            continue
        if inter > 0:
            m = m & (pan == 0)
        seg_id += 1
        cat = C.THING_ID2CAT[int(dets["classes"][i])]
        inst_id = cat * 10000 + seg_id
        pan[m] = inst_id
        segments.append({"id": inst_id, "isthing": True,
                         "score": float(scores[i]),
                         "category_id": cat, "instance_id": int(i)})

    for lbl in np.unique(sem_seg):
        if lbl == 0:
            continue
        m = (sem_seg == lbl) & (pan == 0)
        area = int(m.sum())
        if area < stuff_area_thresh:
            continue
        seg_id += 1
        cat = C.STUFF_ID2CAT[int(lbl)]
        pan[m] = cat * 10000
        segments.append({"id": cat * 10000, "isthing": False,
                         "category_id": cat, "area": area})

    return pan, segments


# ---------------- high-level runner ----------------


class PanopticPredictor:
    """Host wrapper: jitted dense path + host panoptic stitching, with
    optional fusion state across a video (reference inference_fusion,
    panoptic_fpn.py:254-308)."""

    def __init__(self, params=None, seed=0, image_hw=(375, 1242),
                 max_dets=100, model_kwargs=None, eager=False,
                 bf16=False):
        """``model_kwargs``: PanopticFPN overrides (e.g. tiny
        backbone_blocks for CI); ``eager=True`` skips jit — required
        on 1-core CPU hosts where the full-model XLA compile is
        prohibitive (see .claude/skills/verify/SKILL.md).
        ``bf16=True`` runs the dense path in bfloat16 (params + image
        cast inside the jitted program; detections returned f32) —
        ~halves the backbone's HBM traffic on TPU. The reference runs
        fp32; opt-in speed mode."""
        self.model = PanopticFPN(**(model_kwargs or {}))
        self.image_hw = image_hw
        self.max_dets = max_dets
        if params is None:
            # init at the stride-32-padded shape (see __call__).
            # jitted: eager init executes the whole dense path op by op
            # (~95 s on CPU for even a tiny backbone vs ~10 s compiled)
            hw_pad = (image_hw[0] + (-image_hw[0]) % 32,
                      image_hw[1] + (-image_hw[1]) % 32)
            dummy = jnp.zeros((1,) + hw_pad + (3,), jnp.float32)
            params = jax.jit(self.model.init)(
                jax.random.PRNGKey(seed), dummy)
        self.params = params
        _jit = (lambda f, **kw: f) if eager else jax.jit

        def _run_m(m, x_u8, feats_warp=None):
            """On-device wrapper: cast the uint8 image and argmax the
            semantic logits ON DEVICE — shipping the raw (H, W, S)
            f32 logits (24 MB at vkitti res) off-device cost ~10x the
            panoptic stitch itself. Also RETURNS the pre-fusion FPN
            features so the caller can cache them for the next frame's
            fusion without re-running the backbone (the reference's
            inference_fusion recomputes ref features per pair,
            panoptic_fpn.py:193-240; round-2 did the same via a second
            _feats dispatch — ~50 ms/frame of duplicate R-50+FPN)."""
            cdt = jnp.bfloat16 if bf16 else jnp.float32
            x = x_u8.astype(cdt)
            H, W = x.shape[1:3]
            feats = m.features(x)
            run_feats = (m.fuse(feats, feats_warp)
                         if feats_warp is not None else feats)
            sem_logits, dets = m.heads(run_feats, (H, W),
                                       max_dets=max_dets)
            # uint8 class ids: the semantic map dominates the per-frame
            # d2h payload (int32 at 384x1248 was 1.9 MB ~ 42 ms through
            # the ~45 MB/s relay; uint8 is 4x less). Class count << 256.
            sem = jnp.argmax(sem_logits[0], axis=-1).astype(jnp.uint8)
            dets = jax.tree.map(
                lambda a: a.astype(jnp.float32)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, dets)
            return sem, dets, feats

        def _run(p, x_u8, feats_ref=None, flow=None, depth=None,
                 pose_ref=None, pose_cur=None, intr=None,
                 bitcompat=False, depth_proj=False):
            """ONE device program per frame: optional pose-depth
            reproject + flow warp + fuse + backbone + heads. Round 3
            dispatched the warp and pose-depth as separate jitted
            programs (panoptic_fpn.py:361-367 then) — each paid relay
            dispatch overhead and XLA could not overlap the warp's
            scatters with the backbone (the fusion path ran at 4.6 fps
            vs 7.3 plain, BENCH_VPS round 3)."""
            if bf16:
                p = jax.tree.map(
                    lambda a: a.astype(jnp.bfloat16)
                    if jnp.issubdtype(a.dtype, jnp.floating) else a, p)
            feats_warp = None
            if feats_ref is not None:
                fl = flow.astype(jnp.float32)
                d = depth
                if d is not None and depth_proj:
                    d = pose_transport_depth(d, pose_ref, pose_cur,
                                             intr)
                feats_warp = flow_warp_features(
                    feats_ref, fl, d, bitcompat=bitcompat)
                if bf16:
                    feats_warp = jax.tree.map(
                        lambda a: a.astype(jnp.bfloat16), feats_warp)
            return self.model.apply(p, x_u8, feats_warp,
                                    method=_run_m)

        self._apply = _jit(_run,
                           static_argnames=("bitcompat", "depth_proj"))
        self._video_id = None
        self._prev = None  # (feats, image)
        self._prev_pose = None
        self.combine_kwargs = {}
        # replay the reference's npy-flow resize/uint16 quirks
        # (panoptic_fpn.py:310-344) bit-for-bit
        self.bitcompat_flow = False
        # reproject ref depth through relative extrinsics before the
        # depth-ordered splat (reference depth_proj_op path,
        # panoptic_fpn.py:205-207, :388-408)
        self.depth_proj = False
        self.intrinsics = None  # (fx, fy, cx, cy) for depth_proj

    def stage_inputs(self, flow=None, depth=None):
        """Start the h2d uploads of a FUTURE frame's file-protocol
        flow/depth now, returning device arrays :meth:`submit`
        accepts verbatim.

        The file-exchange mode (the reference's shared_data .npy seam,
        SURVEY §1 layer 2) ships ~2 MB/frame of flow through the
        ~45 MB/s relay; staged one frame ahead, that upload streams
        while the PREVIOUS frame's device program and d2h are in
        flight instead of serializing in front of this frame's
        dispatch (round-4 verdict weak #5: file-protocol 8.97 fps vs
        the 10 fps envelope). Dtype choices mirror :meth:`submit`:
        f16 payloads unless bit-compat replay / pose-reprojection
        need full precision. ``depth`` may be the VO module's 1/8-res
        map (the actual shared_data contract, reference
        test_vo2.py:135-136) — the splat resizes per FPN level from
        whatever resolution arrives.
        """
        fl = d = None
        if flow is not None:
            fdt = np.float32 if self.bitcompat_flow else np.float16
            fl = jnp.asarray(np.asarray(flow, fdt))
        if depth is not None:
            ddt = (np.float32 if (self.bitcompat_flow or
                                  self.depth_proj) else np.float16)
            d = jnp.asarray(np.asarray(depth, ddt))
        return fl, d

    def submit(self, image_bgr, video_id=None, flow=None, depth=None,
               pose_w2c=None):
        """Dispatch the dense path for one frame WITHOUT waiting.

        Returns an opaque pending handle for :meth:`result`. The d2h
        copies of the (small) outputs are queued at dispatch time, so
        by the time the caller resolves the handle — ideally after
        submitting the NEXT frame — the transfers have ridden out the
        device time of the frame behind them (~90 ms of h2d + d2h
        through the ~45 MB/s relay otherwise serializes between device
        programs; docs/PERF.md round 3). Fusion state (the previous
        frame's FPN features) advances at submit time, so submitting
        frame t+1 before resolving frame t is exactly the video
        semantics of the sequential path.
        """
        H0, W0 = image_bgr.shape[:2]
        ph = (-H0) % 32
        pw = (-W0) % 32
        image_bgr = np.asarray(image_bgr)
        if ph or pw:
            image_bgr = np.pad(image_bgr, ((0, ph), (0, pw), (0, 0)))
        # ship uint8 (4x less relay traffic); cast happens on device
        x = jnp.asarray(np.clip(image_bgr, 0, 255).astype(np.uint8)
                        )[None]
        fusion = (flow is not None and video_id is not None and
                  video_id == self._video_id and self._prev is not None)
        if fusion:
            feats_ref = self._prev
            if depth is None:
                d = None
            elif isinstance(depth, jax.Array):
                # device-resident depth (PVO-loop mode: VO produced it
                # on device) — no relay round-trip
                d = depth.astype(jnp.float32)
            elif self.bitcompat_flow or self.depth_proj:
                # reprojection / bit-replay need full precision
                d = jnp.asarray(depth, jnp.float32)
            else:
                # z-order splat only consumes depth ORDER — f16 halves
                # the relay payload (~40 -> ~20 ms at vkitti res)
                d = jnp.asarray(np.asarray(depth, np.float16))
            depth_proj = (d is not None and self.depth_proj and
                          pose_w2c is not None and
                          self._prev_pose is not None)
            # ship the flow as f16: it is truncated to integer pixel
            # offsets on device anyway, and the f32 payload (3.7 MB at
            # vkitti res) costs ~80 ms through the ~45 MB/s relay —
            # the round-3 fusion-vs-plain gap almost exactly. bitcompat
            # replay keeps f32 (the uint16 C-cast must see the exact
            # reference values).
            if isinstance(flow, jax.Array):
                # device-resident flow: keep it on device (a numpy
                # cast here would force a d2h+h2d round trip)
                fl = flow.astype(jnp.float32 if self.bitcompat_flow
                                 else jnp.float16)
            else:
                fdt = (np.float32 if self.bitcompat_flow
                       else np.float16)
                fl = jnp.asarray(np.asarray(flow, fdt))
            sem_dev, dets, feats_cur = self._apply(
                self.params, x, feats_ref, fl, d,
                jnp.asarray(self._prev_pose, jnp.float32)
                if depth_proj else None,
                jnp.asarray(pose_w2c, jnp.float32)
                if depth_proj else None,
                self.intrinsics if depth_proj else None,
                bitcompat=self.bitcompat_flow, depth_proj=depth_proj)
        else:
            sem_dev, dets, feats_cur = self._apply(self.params, x)

        self._prev = feats_cur
        self._video_id = video_id
        self._prev_pose = pose_w2c

        # queue the d2h copies NOW: they stream the moment the program
        # retires instead of paying a relay round-trip at resolve time
        for leaf in jax.tree.leaves(dets) + [sem_dev]:
            if hasattr(leaf, "copy_to_host_async"):
                leaf.copy_to_host_async()
        return (sem_dev, dets, (H0, W0))

    def result(self, pending):
        """Resolve a :meth:`submit` handle: blocking d2h + host
        panoptic stitch. Returns (pan, segments_info, sem, dets).

        ``sem`` is a (H, W) **uint8** map of contiguous semantic class
        ids (the class count is far below 256; int32 would quadruple
        the dominant per-frame d2h payload through the relay). Callers
        doing signed arithmetic or negative-sentinel masking on it
        should cast to int32 themselves."""
        sem_dev, dets, (H0, W0) = pending
        sem = np.asarray(sem_dev)[:H0, :W0]
        dets_np = {k: np.asarray(v) for k, v in dets.items()}
        pan, segs = combine_panoptic(dets_np, sem,
                                     **self.combine_kwargs)
        return pan, segs, sem, dets_np

    def __call__(self, image_bgr, video_id=None, flow=None, depth=None,
                 pose_w2c=None):
        """image_bgr: (H, W, 3) float/uint8 BGR. pose_w2c: optional
        (4, 4) world-to-camera extrinsic for the depth_proj path.
        Returns (panoptic (H, W) int32, segments_info, sem_seg, dets);
        ``sem_seg`` is uint8 class ids (see :meth:`result`).

        Inputs whose H/W are not multiples of the FPN's largest
        stride (32) are zero-padded bottom/right like detectron2's
        ImageList.from_tensors(size_divisibility) and the semantic
        logits cropped back. Synchronous convenience form of
        :meth:`submit` + :meth:`result`; video pipelines should keep
        one frame in flight via the async pair instead.
        """
        return self.result(self.submit(image_bgr, video_id, flow,
                                       depth, pose_w2c))
