"""Training losses for the VO network.

Rebuild of the reference loss library (VO_Module/droid_slam/geom/
losses.py): geodesic pose loss with Sim3 scale fitting, BA residual
loss, camera-flow / full-flow EPE losses, photometric losses with SSIM
and occlusion masks, and the dynamic-mask label losses (GT-supervised
and self-labeled). All per-iteration lists are weighted gamma^(n-i-1)
like the reference.

Everything is pure JAX over pytrees of per-step outputs from
DroidNet.__call__.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from pvo_tpu.geom import projective
from pvo_tpu.lie import se3, sim3

GAMMA = 0.9


def _step_weights(n, gamma=GAMMA):
    return [gamma ** (n - i - 1) for i in range(n)]


def fit_scale(Ps, Gs):
    """Least-squares scale aligning translations (losses.py:24-30)."""
    b = Ps.shape[0]
    t1 = jax.lax.stop_gradient(Ps[..., :3]).reshape(b, -1)
    t2 = jax.lax.stop_gradient(Gs[..., :3]).reshape(b, -1)
    return jnp.sum(t1 * t2, -1) / (jnp.sum(t2 * t2, -1) + 1e-8)


def geodesic_loss(Ps, Gs_list, ii, jj, gamma=GAMMA, do_scale=True):
    """Per-iteration relative-pose loss (losses.py:32-76).

    Ps: (B, F, 7) GT w2c. Gs_list: list of (B, F, 7) estimates.
    """
    ii = np.asarray(ii)
    jj = np.asarray(jj)
    dP = se3.mul(Ps[:, jj], se3.inv(Ps[:, ii]))

    n = len(Gs_list)
    total = 0.0
    metrics: Dict[str, jnp.ndarray] = {}
    for i, w in enumerate(_step_weights(n, gamma)):
        dG = se3.mul(Gs_list[i][:, jj], se3.inv(Gs_list[i][:, ii]))
        if do_scale:
            s = fit_scale(dP, dG)
            dG_s = sim3.from_se3(dG).at[..., 7].mul(s[:, None])
            dP_s = sim3.from_se3(dP)
            d = sim3.log(sim3.mul(dG_s, sim3.inv(dP_s)))
            tau, phi, sig = d[..., :3], d[..., 3:6], d[..., 6:]
            total += w * (
                jnp.mean(jnp.linalg.norm(tau, axis=-1)) +
                jnp.mean(jnp.linalg.norm(phi, axis=-1)) +
                0.05 * jnp.mean(jnp.linalg.norm(sig, axis=-1)))
            dE = d
        else:
            d = se3.log(se3.mul(dG, se3.inv(dP)))
            tau, phi = d[..., :3], d[..., 3:]
            total += w * (
                jnp.mean(jnp.linalg.norm(tau, axis=-1)) +
                jnp.mean(jnp.linalg.norm(phi, axis=-1)))
            dE = d

    r_err = (180.0 / np.pi) * jnp.linalg.norm(
        jax.lax.stop_gradient(dE[..., 3:6]), axis=-1)
    t_err = jnp.linalg.norm(jax.lax.stop_gradient(dE[..., :3]), axis=-1)
    metrics = {
        "rot_error": jnp.mean(r_err),
        "tr_error": jnp.mean(t_err),
        "bad_rot": jnp.mean((r_err < 0.1).astype(jnp.float32)),
        "bad_tr": jnp.mean((t_err < 0.01).astype(jnp.float32)),
    }
    return total, metrics


def residual_loss(residuals: List, gamma=GAMMA):
    """L1 on BA residuals per iteration (losses.py:79-88)."""
    total = 0.0
    for r, w in zip(residuals, _step_weights(len(residuals), gamma)):
        total += w * jnp.mean(jnp.abs(r))
    return total, {"residual": total}


def cam_flow_loss(Ps, disps, poses_list, disps_list, intrinsics,
                  gamma=GAMMA):
    """EPE between GT camera-induced flow and estimated flow over the
    |i-j|=1 ring graph (losses.py:91-121). disps_list entries are at
    FULL resolution (upsampled); GT disps full resolution."""
    B, F = Ps.shape[:2]
    ii, jj = [], []
    for i in range(F):
        for j in (i - 1, i + 1):
            if 0 <= j < F:
                ii.append(i)
                jj.append(j)
    ii, jj = np.asarray(ii), np.asarray(jj)

    coords0, val0 = projective.projective_transform(
        Ps, disps, intrinsics, ii, jj)
    val0 = val0 * (disps[:, ii] > 0).astype(val0.dtype)[..., None]

    n = len(poses_list)
    total = 0.0
    for i, w in enumerate(_step_weights(n, gamma)):
        coords1, val1 = projective.projective_transform(
            poses_list[i], disps_list[i], intrinsics, ii, jj)
        v = (val0 * val1)[..., 0]
        epe = v * jnp.linalg.norm(coords1 - coords0, axis=-1)
        total += w * jnp.mean(epe)

    epe_flat = epe.reshape(-1)
    v_flat = v.reshape(-1)
    sel = v_flat > 0.5
    denom = jnp.maximum(jnp.sum(sel), 1)
    metrics = {
        "f_error": jnp.sum(jnp.where(sel, epe_flat, 0)) / denom,
        "1px": jnp.sum(jnp.where(sel, (epe_flat < 1.0).astype(
            jnp.float32), 0)) / denom,
    }
    return total, metrics


def flow_loss(fo_flows, ba_flows, full_flows, gamma=GAMMA):
    """Supervised full-flow loss vs GT forward/backward flows
    (losses.py:124-148). full_flows entries: (B, 2(F-1), H, W, 2)
    ordered [fwd_0, bwd_0, fwd_1, bwd_1, ...]."""
    fo_vals = fo_flows[..., 2]
    ba_vals = ba_flows[..., 2]
    total = 0.0
    for f, w in zip(full_flows, _step_weights(len(full_flows), gamma)):
        fo_e = jnp.mean(jnp.linalg.norm(
            f[:, 0::2] - fo_flows[..., :2], axis=-1) * fo_vals)
        ba_e = jnp.mean(jnp.linalg.norm(
            f[:, 1::2] - ba_flows[..., :2], axis=-1) * ba_vals)
        f_e = 0.5 * (fo_e + ba_e)
        total += w * f_e
    return total, {"pure_f_error": f_e}


# ---------------- photometric ----------------


def _gaussian_kernel(size=3, sigma=1.5):
    ax = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-(ax ** 2) / (2 * sigma ** 2))
    k = np.outer(g, g)
    return jnp.asarray(k / k.sum(), jnp.float32)


def _filter2d(x, k):
    """Depthwise 2D filter on (B, H, W, C)."""
    C = x.shape[-1]
    kern = jnp.tile(k[:, :, None, None], (1, 1, 1, C))
    return jax.lax.conv_general_dilated(
        x, kern, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C)


def ssim(x, y, max_val=1.0, size=3, sigma=1.5):
    """SSIM map (reference SSIM module, losses.py:365-398)."""
    k = _gaussian_kernel(size, sigma)
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mx = _filter2d(x, k)
    my = _filter2d(y, k)
    mxx = _filter2d(x * x, k) - mx * mx
    myy = _filter2d(y * y, k) - my * my
    mxy = _filter2d(x * y, k) - mx * my
    num = (2 * mx * my + c1) * (2 * mxy + c2)
    den = (mx * mx + my * my + c1) * (mxx + myy + c2)
    return num / den


def bilinear_sample(img, coords):
    """Sample (B, H, W, C) at coords (B, H, W, 2) [x, y]; zero pad
    out of bounds (grid_sample zeros semantics)."""
    B, H, W, C = img.shape
    x, y = coords[..., 0], coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx, fy = x - x0, y - y0

    def gather(yi, xi):
        inb = ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W))
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        flat = img.reshape(B, H * W, C)
        idx = (yc * W + xc).reshape(B, -1)
        out = jnp.take_along_axis(flat, idx[..., None], axis=1)
        out = out.reshape(B, H, W, C)
        return out * inb[..., None].astype(img.dtype)

    w00 = ((1 - fy) * (1 - fx))[..., None]
    w01 = ((1 - fy) * fx)[..., None]
    w10 = (fy * (1 - fx))[..., None]
    w11 = (fy * fx)[..., None]
    return (w00 * gather(y0, x0) + w01 * gather(y0, x0 + 1) +
            w10 * gather(y0 + 1, x0) + w11 * gather(y0 + 1, x0 + 1))


def photo_loss(images_pairs, full_flows, use_ssim=True, gamma=GAMMA,
               occ_masks=None):
    """Photometric warp loss by full flow (losses.py:151-211).

    images_pairs: tuple (I_src (B,N,H,W,3), I_dst (B,N,H,W,3)) in [0,1]
    aligned with the flow edge list. full_flows: per-step (B,N,H,W,2).
    """
    I_src, I_dst = images_pairs
    B, N, H, W, C = I_src.shape
    grid = projective.coords_grid(H, W)

    total = 0.0
    n = len(full_flows)
    for f, w in zip(full_flows, _step_weights(n, gamma)):
        coords = grid + f
        warped = bilinear_sample(
            I_dst.reshape(B * N, H, W, C),
            coords.reshape(B * N, H, W, 2)).reshape(I_src.shape)
        err = jnp.abs(warped - I_src)
        if use_ssim:
            s = ssim(warped.reshape(B * N, H, W, C),
                     I_src.reshape(B * N, H, W, C)).reshape(I_src.shape)
            err = 0.85 * (1 - s) / 2 + 0.15 * err
        if occ_masks is not None:
            err = err * occ_masks[..., None]
        total += w * jnp.mean(err)
    return total, {"photo": total}


# ---------------- dynamic-mask labels ----------------


def gt_label_loss(mask_logits_list, gt_static_masks, gamma=GAMMA):
    """BCE between mask head logits and GT static masks
    (losses.py:505-533). gt_static_masks: (B, N, H, W) in {0,1}
    (1 = static)."""
    total = 0.0
    for m, w in zip(mask_logits_list,
                    _step_weights(len(mask_logits_list), gamma)):
        # m: (B, N, H, W, 2) probabilities in (0,1)
        p = jnp.clip(m, 1e-6, 1 - 1e-6)
        y = gt_static_masks[..., None]
        bce = -(y * jnp.log(p) + (1 - y) * jnp.log(1 - p))
        total += w * jnp.mean(bce)
    return total, {"mask_bce": total}


def self_label_masks(full_flow, cam_flow, thresh=0.5):
    """Self-supervised static labels: static where the full flow and
    camera flow agree (losses.py:429-461)."""
    d = jnp.linalg.norm(full_flow - cam_flow, axis=-1)
    return (d <= thresh).astype(jnp.float32)


def ce_reg_loss(mask_probs_list, gamma=GAMMA):
    """Entropy regularization pushing masks to 0/1
    (losses.py:410-426)."""
    total = 0.0
    for m, w in zip(mask_probs_list,
                    _step_weights(len(mask_probs_list), gamma)):
        p = jnp.clip(m, 1e-6, 1 - 1e-6)
        ent = -(p * jnp.log(p) + (1 - p) * jnp.log(1 - p))
        total += w * jnp.mean(ent)
    return total, {"ce_reg": total}


def consistency_loss(mask_probs_list, gamma=GAMMA):
    """Consistency between the two mask channels (losses.py:541-568)."""
    total = 0.0
    for m, w in zip(mask_probs_list,
                    _step_weights(len(mask_probs_list), gamma)):
        total += w * jnp.mean(jnp.abs(m[..., 0] - m[..., 1]))
    return total, {"consistency": total}
