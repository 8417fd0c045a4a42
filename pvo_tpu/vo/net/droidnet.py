"""DroidNet: recurrent dense-VO network with differentiable BA, flax.

Rebuild of the reference DroidNet (VO_Module/droid_slam/droid_net.py:
317-440): fnet/cnet encoders, the DynamicUpdateModule, and the iterative
forward used for TRAINING — each step does corr lookup -> GRU -> heads ->
dynamic-mask gating -> 2 differentiable BA steps -> reprojection, and
collects per-step poses/disps/residuals/flows/masks for the loss.

TPU design:
  * frames and edges are flat leading dims, channels-last;
  * the frame graph (ii, jj) is static per compile (host-built), so BA
    scatters are static segment-sums;
  * per-step tensors are detached (stop_gradient) at step start exactly
    like the reference (droid_net.py:375-381), so backprop depth per step
    is constant;
  * the correlation pyramid is materialized once per forward with one
    batched MXU matmul.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from pvo_tpu.geom import projective
from pvo_tpu.geom.ba import bundle_adjust
from pvo_tpu.geom.upsample import cvx_upsample, upsample_inter

from . import corr as corr_ops
from .extractor import BasicEncoder
from .update import MASK_NUM, DynamicUpdateModule, GraphAgg

# ImageNet statistics used to normalize RGB inputs (values in [0,1]).
RGB_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
RGB_STD = np.array([0.229, 0.224, 0.225], np.float32)

DY_THRESH = 0.5


def normalize_images(images_u8_rgb):
    """uint8 RGB (..., H, W, 3) -> normalized float (..., H, W, 3).

    The reference stores BGR uint8 and flips to RGB at the model boundary
    (droid_net.py:329); we take RGB directly and normalize identically.
    """
    x = images_u8_rgb.astype(jnp.float32) / 255.0
    return (x - RGB_MEAN) / RGB_STD


class DroidNet(nn.Module):
    use_aff_bri: bool = False

    def setup(self):
        self.fnet = BasicEncoder(output_dim=128, norm_fn="instance")
        self.cnet = BasicEncoder(output_dim=256, norm_fn="none")
        self.update = DynamicUpdateModule(self.use_aff_bri)
        self.agg = GraphAgg()

    def extract_features(self, images, dtype=None):
        """images: (B, F, H, W, 3) uint8 RGB. Returns fmaps, net, inp
        at 1/8 resolution, each (B, F, h, w, 128). ``dtype`` casts the
        normalized input so bf16 param trees actually compute on the
        MXU in bf16 (flax promotion would silently upcast to f32)."""
        x = normalize_images(images)
        if dtype is not None:
            x = x.astype(dtype)
        fmaps = self.fnet(x)
        ctx = self.cnet(x)
        net, inp = jnp.split(ctx, 2, axis=-1)
        return fmaps, jnp.tanh(net), nn.relu(inp)

    def __call__(self, poses, images, disps, intrinsics, ii, jj,
                 num_steps=12, fixedp=2, ret_flow=False,
                 downsample=False, remat=False, final_only=False,
                 corr_impl="xla", compute_dtype=None):
        """Training forward.

        Args:
          poses: (B, F, 7) initial w2c SE3.
          images: (B, F, H, W, 3) uint8 RGB.
          disps: (B, F, h, w) initial inverse depth (1/8 res).
          intrinsics: (B, F, 4) at 1/8 resolution.
          ii, jj: static numpy edge lists.
          remat: rematerialize each recurrent iteration on backward —
            the reference-recipe 15-iteration unroll at the 200x400
            crop holds ~15x the per-iteration GRU/BA activations
            otherwise (reference fidelity is unaffected: the carried
            state is detached at iteration entry like the reference's
            .detach() chain, so remat only trades compute for memory).
          final_only: INFERENCE shortcut — compute the full-res
            upsampled outputs (disps_up/masks_up/flows) only for the
            LAST iteration. Exactly equivalent for those outputs: the
            upsamples are pure functions of per-iteration state with
            no feedback into the recurrence, so skipping the first
            num_steps-1 of them changes nothing the export reads
            (the reference test_vo2.py:109-115 keeps only [-1] too,
            it just pays for all 15 on GPU).
          corr_impl: "xla" (gather lookup, differentiable — training
            default) or "pallas" (fused kernel on pre-built volumes;
            inference-only, no VJP; values bf16-volume-rounded like
            the reference's fp16 CorrBlock; silently falls back to
            XLA when the geometry exceeds the kernel's VMEM gate).
          compute_dtype: cast encoder/update-op inputs to this dtype
            (pass jnp.bfloat16 with a bf16-cast param tree to mirror
            the reference's fp16 autocast; BA/geometry stays f32).
        Returns dict of per-step lists: poses, disps_up, residuals,
        masks_up, and (if ret_flow) flows.
        """
        ii = np.asarray(ii).reshape(-1)
        jj = np.asarray(jj).reshape(-1)
        B, F = images.shape[:2]
        assert B == 1, "training forward is per-sample; vmap over batch"

        fmaps, net_all, inp_all = self.extract_features(
            images, dtype=compute_dtype)
        h, w = fmaps.shape[2:4]

        net = net_all[0, ii]
        inp = inp_all[0, ii]

        use_pallas = False
        if corr_impl == "pallas":
            from pvo_tpu.vo.factor_graph import _use_pallas_corr
            use_pallas = _use_pallas_corr(h, w)
        if use_pallas:
            from pvo_tpu.vo.net.pallas_corr import (
                corr_level_shapes, pallas_build_volumes,
                pallas_corr_extract, pallas_corr_lookup)
            vshapes = corr_level_shapes(h, w)
            if all(n_t == 1 and m_t == 1
                   for (_, _, n_t, m_t) in vshapes):
                # narrow geometry: volumes built once, extracted per
                # iteration (the planner's cache)
                vols = pallas_build_volumes(fmaps[0, ii],
                                            fmaps[0, jj])

                def corr_fn(c):
                    return pallas_corr_extract(vols, vshapes, c)
            else:
                # wide geometry (x-tiled): the fused kernel recomputes
                # the all-pairs dot per call — still far cheaper than
                # the XLA gather path at these shapes
                f1e, f2e = fmaps[0, ii], fmaps[0, jj]

                def corr_fn(c):
                    return pallas_corr_lookup(f1e, f2e, c)
        else:
            pyramid = corr_ops.build_pyramid(fmaps[0, ii],
                                             fmaps[0, jj])

            def corr_fn(c):
                return corr_ops.lookup(pyramid, c)

        coords0 = projective.coords_grid(h, w)
        coords1, _ = projective.projective_transform(
            poses, disps, intrinsics, ii, jj)
        target_cam = coords1
        delta_dy = jnp.zeros_like(coords1)
        raw_mask = jnp.zeros(coords1.shape[:-1] + (MASK_NUM,),
                             coords1.dtype)

        num_frames = int(F)
        seg_ids = jnp.asarray(ii, jnp.int32)

        out: Dict[str, Any] = {k: [] for k in
                               ("poses", "disps_up", "residuals",
                                "masks_up", "flows", "aff_params")}

        kx = np.unique(ii)

        def _one_step(mdl, net, poses, disps, coords1, target_cam,
                      delta_dy, raw_mask, inp, intrinsics, want_up):
            corr = corr_fn(coords1[0])

            cam_flow = coords1 - coords0
            resd = target_cam - coords1
            motion = jnp.concatenate(
                [cam_flow, cam_flow + delta_dy, resd, raw_mask],
                axis=-1)
            motion = jnp.clip(motion, -64.0, 64.0)

            # compute dtype follows inp (bf16 when compute_dtype set);
            # everything the BA consumes is cast back to f32
            upd = mdl.update(net, inp, corr.astype(inp.dtype),
                             motion[0].astype(inp.dtype))
            net = upd["net"]

            raw_mask = raw_mask + upd["delta_mask"][None]
            mask = nn.sigmoid(raw_mask)
            bin_mask = (mask >= DY_THRESH).astype(mask.dtype)

            target_cam = coords1 + upd["delta"][None].astype(
                jnp.float32)
            weight = nn.sigmoid(
                upd["weight_logits"][None].astype(jnp.float32) +
                (1 - bin_mask) * 10.0)

            eta, upmask = mdl.agg(net, seg_ids, num_frames)
            eta_k = eta[kx, ..., 0][None].astype(jnp.float32)

            for _ in range(2):
                poses, disps = bundle_adjust(
                    target_cam, weight, eta_k, poses, disps,
                    intrinsics, ii, jj, fixedp=fixedp)

            coords1, valid = projective.projective_transform(
                poses, disps, intrinsics, ii, jj)
            residual = (target_cam - coords1) * valid

            delta_dy = upd["delta_dy"][None].astype(jnp.float32) * \
                (1 - bin_mask)
            target_all = coords1 + delta_dy

            disps_up = (cvx_upsample(
                disps[0, kx, :, :, None],
                upmask[kx].astype(jnp.float32))[None, ..., 0]
                if want_up else None)

            aff = (upd["aff_params"][None] if self.use_aff_bri
                   else jnp.zeros((1,)))
            return (net, poses, disps, coords1, target_cam, delta_dy,
                    raw_mask, residual, mask, disps_up, target_all,
                    aff)

        step_fn = (nn.remat(_one_step, static_argnums=(10,))
                   if remat else _one_step)

        for it in range(num_steps):
            poses = jax.lax.stop_gradient(poses)
            disps = jax.lax.stop_gradient(disps)
            coords1 = jax.lax.stop_gradient(coords1)
            target_cam = jax.lax.stop_gradient(target_cam)
            delta_dy = jax.lax.stop_gradient(delta_dy)
            raw_mask = jax.lax.stop_gradient(raw_mask)

            want_up = (not final_only) or (it == num_steps - 1)
            (net, poses, disps, coords1, target_cam, delta_dy,
             raw_mask, residual, mask, disps_up, target_all,
             aff) = step_fn(self, net, poses, disps, coords1,
                            target_cam, delta_dy, raw_mask, inp,
                            intrinsics, want_up)

            out["poses"].append(poses)
            out["residuals"].append(residual)
            if want_up:
                out["disps_up"].append(disps_up)
                out["masks_up"].append(upsample_inter(mask))
                if ret_flow:
                    if downsample:
                        out["flows"].append(target_all - coords0)
                    else:
                        out["flows"].append(upsample_inter(
                            (target_all - coords0) * 8.0))
            if self.use_aff_bri:
                out["aff_params"].append(aff)

        return out
