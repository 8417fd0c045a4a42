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


def _avg3_reflect(x):
    """3x3 average pool, stride 1, reflection-padded (the reference
    SSIM module's AvgPool2d(3,1) after ReflectionPad2d(1))."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    H, W = x.shape[1], x.shape[2]
    # 9 shifted-slice adds: exact f32 (a conv here computes in reduced
    # precision on TPU) and reverse-mode differentiable (the generic
    # reduce_window VJP is not)
    s = 0.0
    for dy in range(3):
        for dx in range(3):
            s = s + xp[:, dy:dy + H, dx:dx + W, :]
    return s * jnp.asarray(1.0 / 9.0, x.dtype)


def ssim_loss(x, y):
    """clamp((1 - SSIM)/2, 0, 1) map — EXACT reference semantics
    (reference SSIM module, losses.py:365-398: 3x3 avg pooling with
    reflection padding, and the loss is CLAMPED to [0, 1]; without the
    clamp, near-zero-variance regions where num/den drifts past 1
    drive the photometric term negative — observed as oscillating
    negative cam_ph on synthetic scenes)."""
    c1 = 0.01 ** 2
    c2 = 0.03 ** 2
    mx = _avg3_reflect(x)
    my = _avg3_reflect(y)
    mxx = _avg3_reflect(x * x) - mx * mx
    myy = _avg3_reflect(y * y) - my * my
    mxy = _avg3_reflect(x * y) - mx * my
    num = (2 * mx * my + c1) * (2 * mxy + c2)
    den = (mx * mx + my * my + c1) * (mxx + myy + c2)
    return jnp.clip((1.0 - num / den) / 2.0, 0.0, 1.0)




def bilinear_sample(img, coords, pad_mode="zeros"):
    """Sample (B, H, W, C) at coords (B, H, W, 2) [x, y].

    pad_mode 'zeros' or 'border' (torch grid_sample semantics with
    align_corners=True when coords are pixel coordinates)."""
    B, H, W, C = img.shape
    x, y = coords[..., 0], coords[..., 1]
    if pad_mode == "border":
        x = jnp.clip(x, 0, W - 1)
        y = jnp.clip(y, 0, H - 1)
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
        if pad_mode == "border":
            return out
        return out * inb[..., None].astype(img.dtype)

    w00 = ((1 - fy) * (1 - fx))[..., None]
    w01 = ((1 - fy) * fx)[..., None]
    w10 = (fy * (1 - fx))[..., None]
    w11 = (fy * fx)[..., None]
    return (w00 * gather(y0, x0) + w01 * gather(y0, x0 + 1) +
            w10 * gather(y0 + 1, x0) + w11 * gather(y0 + 1, x0 + 1))


def mean_on_mask(diff, val_pix, min_count=10000):
    """Valid-count-normalized mean — EXACT reference semantics
    (losses.py:400-408): the photometric terms divide by the number of
    VALID (mask-expanded) entries, not the tensor size, and collapse
    to 0 when nearly everything is masked (the reference's
    'most pixels are masked' guard at 10000 entries). A total-size
    mean silently down-weights heavily-masked frames by the valid
    fraction."""
    mask = jnp.broadcast_to(val_pix, diff.shape)
    s = jnp.sum(mask)
    mean = jnp.sum(diff * mask) / jnp.maximum(s, 1.0)
    return jnp.where(s > min_count, mean, jnp.zeros_like(mean))


def _reprojection_error(img0, warped, use_ssim):
    """0.85 SSIM + 0.15 L1 when use_ssim, else L1 (reference
    compute_reprojection_loss)."""
    l1 = jnp.abs(warped - img0)
    if not use_ssim:
        return l1
    return 0.85 * ssim_loss(warped, img0) + 0.15 * l1


def photo_loss_full(images, full_flows, vals, ii, jj, gamma=GAMMA,
                    use_ssim=False, aff_params=None, downsample=True):
    """Photometric loss along the FULL (camera+dynamic) flow
    (reference losses.py:151-211).

    images: (B, F, H, W, 3) in [0, 255]; full_flows: per-step
    (B, N, h, w, 2) at 1/8 res when downsample; vals: (B, F, H, W)
    validity (e.g. GT mask validity) or None.
    """
    ii = np.asarray(ii)
    jj = np.asarray(jj)
    if downsample:
        images = images[:, :, 3::8, 3::8]
        if vals is not None:
            vals = vals[:, :, 3::8, 3::8]
    B, F, ht, wd, C = images.shape
    img0 = images[:, ii].reshape(-1, ht, wd, C) / 255.0
    img1 = images[:, jj].reshape(-1, ht, wd, C) / 255.0
    v_all = (vals[:, ii].reshape(-1, ht, wd) if vals is not None
             else jnp.ones((img0.shape[0], ht, wd)))
    grid = projective.coords_grid(ht, wd)

    total = 0.0
    n = len(full_flows)
    for i, w in enumerate(_step_weights(n, gamma)):
        coords = (grid + full_flows[i]).reshape(-1, ht, wd, 2)
        inb = ((coords[..., 0] >= 0) & (coords[..., 0] <= wd - 1) &
               (coords[..., 1] >= 0) & (coords[..., 1] <= ht - 1))
        val_pix = inb.astype(jnp.float32) * v_all
        warped = bilinear_sample(img1, coords, pad_mode="border")
        if aff_params is not None:
            a = aff_params[i][..., 0].reshape(-1, 1, 1, 1)
            b = (aff_params[i][..., 1] - 0.5).reshape(-1, 1, 1, 1)
            warped = warped * a + b
        diff = _reprojection_error(img0, warped, use_ssim)
        p_e = mean_on_mask(diff, val_pix[..., None])
        total += w * p_e
    return total, {"ph_error": p_e}


def photo_loss_cam(images, poses_list, disps_list, intrinsics,
                   static_masks, gamma=GAMMA, use_ssim=True):
    """Photometric loss along the CAMERA-induced flow over the ring
    graph, masked to static pixels (reference losses.py:214-265).

    images (B,F,H,W,3) 0..255 FULL res; disps_list entries full-res;
    static_masks (B,F,H,W) 1=static.
    """
    B, F, H, W, C = images.shape
    ii, jj = [], []
    for i in range(F):
        for j in (i - 1, i + 1):
            if 0 <= j < F:
                ii.append(i)
                jj.append(j)
    ii, jj = np.asarray(ii), np.asarray(jj)

    img0 = images[:, ii].reshape(-1, H, W, C) / 255.0
    img1 = images[:, jj].reshape(-1, H, W, C) / 255.0
    m_all = static_masks[:, ii].reshape(-1, H, W)

    total = 0.0
    n = len(poses_list)
    for i, w in enumerate(_step_weights(n, gamma)):
        coords, val0 = projective.projective_transform(
            poses_list[i], disps_list[i], intrinsics, ii, jj)
        coords = coords.reshape(-1, H, W, 2)
        inb = ((coords[..., 0] >= 0) & (coords[..., 0] <= W - 1) &
               (coords[..., 1] >= 0) & (coords[..., 1] <= H - 1))
        val_pix = (inb.astype(jnp.float32) *
                   val0.reshape(-1, H, W) * m_all)
        warped = bilinear_sample(img1, coords, pad_mode="border")
        diff = _reprojection_error(img0, warped, use_ssim)
        p_e = mean_on_mask(diff, val_pix[..., None])
        total += w * p_e
    return total, {"ph_cam_error": p_e}


def unsup_occ_vals(poses_list, disps_list, intrinsics, ii, jj,
                   thresh=0.15):
    """Occlusion validity from projected-depth consistency (reference
    losses.py:268-320, simplified to the final-step estimate): a pixel
    is valid if its depth reprojected into frame jj agrees with frame
    jj's own depth."""
    poses, disps = poses_list[-1], disps_list[-1]
    coords, valid = projective.projective_transform(
        poses, disps, intrinsics, ii, jj, return_depth=True)
    d_proj = coords[..., 2]
    B, N, H, W = d_proj.shape
    d_obs = bilinear_sample(
        disps[:, jj].reshape(-1, H, W, 1),
        coords[..., :2].reshape(-1, H, W, 2),
        pad_mode="border").reshape(B, N, H, W)
    rel = jnp.abs(d_proj - d_obs) / jnp.maximum(d_obs, 1e-3)
    return (rel < thresh).astype(jnp.float32) * valid[..., 0]


def unsup_dy_vals(vals, dy_masks, ii):
    """Fold dynamic-region masks into occlusion validity masks
    (reference losses.py:323-345): static pixels (mask==0) become
    unconditionally valid, dynamic pixels (mask==1) keep their
    occlusion validity — val = clamp(val + (1 - dy), 0, 1).

    vals: (B, N, H, W) or a per-step list of such. dy_masks: either a
    per-frame (B, F, H', W') tensor (GT dynamic masks; full-res inputs
    are reduced with the reference's ``3::8`` pixel-center
    subsampling) gathered at edge sources ``ii``, or a per-step list
    of edge-aligned (B, N, H, W) masks (e.g. self labels).
    """
    single = not isinstance(vals, (list, tuple))
    vlist = [vals] if single else list(vals)

    if isinstance(dy_masks, (list, tuple)):
        dlist = [d.reshape(v.shape) for d, v in zip(dy_masks, vlist)]
    else:
        m = dy_masks
        hw = vlist[0].shape[-2:]
        if m.shape[-2:] != hw:
            m = m[..., 3::8, 3::8]
        ii = np.asarray(ii).reshape(-1)
        dlist = [m[:, ii]] * len(vlist)

    out = [jnp.clip(v + (1.0 - d), 0.0, 1.0)
           for v, d in zip(vlist, dlist)]
    return out[0] if single else out


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
            s_l = ssim_loss(
                warped.reshape(B * N, H, W, C),
                I_src.reshape(B * N, H, W, C)).reshape(I_src.shape)
            err = 0.85 * s_l + 0.15 * err
        if occ_masks is not None:
            total += w * mean_on_mask(err, occ_masks[..., None])
        else:
            total += w * mean_on_mask(err, jnp.ones_like(err[..., :1]))
    return total, {"photo": total}


# ---------------- dynamic-mask labels ----------------


def gt_label_loss(gt_masks, gt_vals, mask_probs_list, ii, gamma=GAMMA):
    """BCE between mask-head probabilities and GT static masks
    (losses.py:505-533).

    gt_masks/gt_vals: (B, F, H, W); mask_probs_list: per-step
    (B, N, H, W, 2) probabilities aligned with edge sources ``ii``.
    """
    ii = np.asarray(ii)
    y = gt_masks[:, ii][..., None]
    v = gt_vals[:, ii][..., None]
    total = 0.0
    for m, w in zip(mask_probs_list,
                    _step_weights(len(mask_probs_list), gamma)):
        p = jnp.clip(m, 1e-6, 1 - 1e-6)
        bce = -(y * jnp.log(p) + (1 - y) * jnp.log(1 - p)) * v
        total += w * jnp.sum(bce) / jnp.maximum(jnp.sum(v), 1.0)
    return total, {"mask_bce": total}


def art_label_loss(art_masks, mask_probs_list, gamma=GAMMA):
    """BCE against self-supervised static labels (losses.py:473-503).
    art_masks: (B, N, H, W) from self_label_masks."""
    y = art_masks[..., None]
    total = 0.0
    for m, w in zip(mask_probs_list,
                    _step_weights(len(mask_probs_list), gamma)):
        p = jnp.clip(m, 1e-6, 1 - 1e-6)
        bce = -(y * jnp.log(p) + (1 - y) * jnp.log(1 - p))
        total += w * jnp.mean(bce)
    return total, {"al_bce": total}


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
