"""Factor graph over keyframes: edge store + recurrent update + DBA.

Rebuild of the reference FactorGraph (VO_Module/droid_slam/
factor_graph.py) around TPU constraints:

  * graph TOPOLOGY (edge lists, ages, inactive/bad stores) lives on the
    host as numpy arrays — O(edges) integer work, exactly the part the
    reference also did on CPU;
  * per-edge STATE (flow targets, confidences, dynamic-mask logits,
    hidden GRU states) lives in padded device buffers of static shape,
    so the jitted update kernel compiles once per bucket size;
  * correlation is computed transiently per update from the feature
    buffer (chunked MXU matmul + windowed gather) — the TPU answer to
    the reference's choice between a cached volume ("volume") and an
    on-the-fly CUDA kernel ("alt"): recompute on the MXU, never cache
    multi-GB volumes in HBM;
  * the dynamic-segment filter (reference factor_graph.py:256-276, a
    numpy host round-trip) is an on-device segment-sum vote over local
    segment ids.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from pvo_tpu.geom import projective
from pvo_tpu.vo import dba as dba_mod
from pvo_tpu.vo.net import corr as corr_ops

DY_THRESH = 0.5
MASK_NUM = 2


def _bucket(n, buckets):
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"size {n} exceeds largest bucket {buckets[-1]}")


import functools as _ft
import os


@_ft.lru_cache(None)
def _pallas_backend_ok():
    env = os.environ.get("PVO_PALLAS_CORR")
    if env is not None:
        return env == "1"
    return jax.default_backend() == "tpu"


# VMEM budget for the fused corr kernel's resident f2 pyramid: the
# core has ~16 MB; leave headroom for the f1/coords blocks, selector
# banks, the (BLK, 4*TAPS) output and compiler scratch.
_CORR_VMEM_BUDGET = 10 * 2 ** 20


def _use_pallas_corr(h=None, w=None):
    """Pallas fused corr on TPU (much faster than the XLA gather
    path); override with PVO_PALLAS_CORR=0/1. Shape-gated by the
    kernel's estimated VMEM footprint (every pyramid level stays fully
    resident per program — pallas_corr.corr_vmem_bytes): geometries
    beyond the budget fall back to the XLA path instead of asserting
    or OOMing VMEM."""
    if not _pallas_backend_ok():
        return False
    if h is not None and w is not None:
        from pvo_tpu.vo.net.pallas_corr import corr_vmem_bytes
        if corr_vmem_bytes(h, w) > _CORR_VMEM_BUDGET:
            return False
    return True


def segment_vote_filter(bin_mask, segm_e, valid, S_MAX, seg_thresh):
    """On-device dynamic-segment vote (replaces the reference's numpy
    unique/count host loop, factor_graph.py:256-276): a panoptic
    segment whose dynamic-pixel fraction exceeds ``seg_thresh`` is
    forced fully dynamic. Segment id 0 ('no segment') is never voted.

    bin_mask: (E, h, w, 2) bool static-mask; segm_e: (E, h, w) local
    segment ids in [0, S_MAX); valid: (E,) edge mask.

    Implementation: broadcast compare-and-reduce over the segment
    axis — (E, S, h*w) one-hot membership is never materialized (XLA
    fuses compare+select+reduce). The earlier 4609-segment
    jax.ops.segment_sum lowered to a sort-based while loop costing
    ~3.6 ms/step at tracking shapes; this form measures ~0.3 ms.
    """
    E, h, w = segm_e.shape
    dyn = ((~bin_mask[..., 0]) | (~bin_mask[..., 1]))    # (E,h,w)
    seg = segm_e.reshape(E, 1, h * w)
    sv = jnp.arange(S_MAX, dtype=segm_e.dtype).reshape(1, S_MAX, 1)
    oh = (seg == sv)                                     # (E,S,hw)
    dynf = dyn.reshape(E, 1, h * w).astype(jnp.float32)
    tot = jnp.sum(oh, axis=2, dtype=jnp.float32)         # (E,S)
    dyn_cnt = jnp.sum(jnp.where(oh, dynf, 0.0), axis=2)  # (E,S)
    killed = (dyn_cnt / jnp.maximum(tot, 1.0)) > seg_thresh
    killed = killed & valid[:, None]
    killed = killed.at[:, 0].set(False)                  # seg id 0
    kill_pix = jnp.any(oh & killed[:, :, None], axis=1)  # (E,hw)
    return bin_mask & (~kill_pix.reshape(E, h, w))[..., None]


# GRU gate-conv input channel layout: [net | ctx | corr-enc | flow-enc]
GRU_CTX_LO, GRU_CTX_HI = 128, 256


def split_gru_ctx_params(p_update):
    """Split the GRU gate kernels' context-channel rows out of an
    update-module param tree.

    Returns ``(p_sliced, ctx_kernels)``: ``p_sliced`` is ``p_update``
    with convz/convr/convq kernels sliced to skip the context channels
    (gate inputs become [net, corr-enc, flow-enc]); ``ctx_kernels``
    maps gate name -> its (3, 3, 128, 128) context slice. Conv
    linearity makes ``apply(p_sliced, ..., ctx_pre=gru_ctx_pre(...))``
    equal to the full apply up to one fp add. The context features are
    constant across a keyframe's 4+2 update iterations, so the fused
    step hoists their gate contribution out of the recurrent loop
    (~28% of the gate-conv FLOPs; the reference recomputes them every
    iteration, droid_net.py:268-270)."""
    from flax.core import freeze, unfreeze
    was_frozen = not isinstance(p_update, dict)
    p = unfreeze(p_update) if was_frozen else \
        jax.tree_util.tree_map(lambda x: x, p_update)
    gru = dict(p["params"]["gru"])
    p["params"] = dict(p["params"])
    p["params"]["gru"] = gru
    ctx = {}
    for gate in ("convz", "convr", "convq"):
        outer = dict(gru[gate])
        node = dict(outer["Conv_0"])
        k = node["kernel"]
        ctx[gate] = k[:, :, GRU_CTX_LO:GRU_CTX_HI, :]
        node["kernel"] = jnp.concatenate(
            [k[:, :, :GRU_CTX_LO, :], k[:, :, GRU_CTX_HI:, :]], axis=2)
        outer["Conv_0"] = node
        gru[gate] = outer
    return (freeze(p) if was_frozen else p), ctx


def gru_ctx_pre(ctx_kernels, ctx):
    """Per-step precompute of the GRU gates' context contributions:
    (pz, pr, pq), each (E, h, w, 128) in ``ctx``'s dtype."""
    dn = ("NHWC", "HWIO", "NHWC")
    outs = []
    for gate in ("convz", "convr", "convq"):
        k = ctx_kernels[gate].astype(ctx.dtype)
        outs.append(jax.lax.conv_general_dilated(
            ctx, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn))
    return tuple(outs)


def _update_core(params, poses, disps, intrinsics, fmaps, inps, segms,
                 net, target_cam, raw_mask, delta_dy,
                 ii, jj, valid, w0, seg_thresh,
                 update_apply, agg_apply, K, S_MAX, segm_filter,
                 corr_chunk=16, corr_vols=None, ctx_pre=None,
                 segms_e=None):
    """One recurrent update over all (padded) edges (traced helper).

    Returns new (net, target_cam, weight, raw_mask, delta_dy, full_flow,
    eta (K,h,w), frame_has_edge (K,)).
    """
    E = ii.shape[0]
    h, w = disps.shape[-2:]
    vm = valid[:, None, None, None].astype(jnp.float32)
    p_update, p_agg = params["update"], params["agg"]

    coords0 = projective.coords_grid(h, w)
    intr_b = jnp.broadcast_to(intrinsics, (1, poses.shape[0], 4))
    coords1, _ = projective.projective_transform(
        poses[None], disps[None], intr_b, ii, jj)
    coords1 = coords1[0]

    # motion features (reference factor_graph.py:232-237)
    motn = jnp.concatenate([
        target_cam - coords0,
        target_cam - coords0 + delta_dy,
        target_cam - coords1,
        raw_mask,
    ], axis=-1)
    motn = jnp.clip(motn, -64.0, 64.0)

    if corr_vols is not None:
        from pvo_tpu.vo.net.pallas_corr import pallas_corr_extract
        # volume cache: the all-pairs matmuls were hoisted out of the
        # per-step loop (the volumes depend only on the feature maps)
        vols, vshapes = corr_vols
        corr = pallas_corr_extract(vols, vshapes, coords1, packed=True)
    elif _use_pallas_corr(h, w):
        from pvo_tpu.vo.net.pallas_corr import pallas_corr_lookup
        # packed 64-tap/level layout; params were expanded to match
        # (packed_update_params in FactorGraph.__init__)
        corr = pallas_corr_lookup(fmaps[ii], fmaps[jj], coords1,
                                  packed=True)
    else:
        corr = corr_ops.chunked_corr_lookup(
            fmaps, ii, jj, coords1, chunk=corr_chunk)

    # compute dtype follows the update-op params (bf16 on TPU mirrors
    # the reference's fp16 autocast, motion_filter.py:34)
    cdt = jax.tree.leaves(p_update)[0].dtype
    if ctx_pre is not None:
        # context gate contributions were hoisted out of the step loop
        # (split_gru_ctx_params); use the ctx-sliced kernel tree
        out = update_apply(params["update_nc"], net.astype(cdt), None,
                           corr.astype(cdt), motn.astype(cdt),
                           ctx_pre=ctx_pre)
    else:
        inp = inps[ii].astype(cdt)
        out = update_apply(p_update, net.astype(cdt), inp,
                           corr.astype(cdt), motn.astype(cdt))
    net_c = out["net"]  # kept in compute dtype for the agg convs
    out = {k: v.astype(jnp.float32) for k, v in out.items()}
    new_net = out["net"]

    raw_mask = raw_mask + out["delta_mask"]
    bin_mask = (jax.nn.sigmoid(raw_mask) >= DY_THRESH)

    if segm_filter:
        if segms_e is None:
            segms_e = segms[ii]
        bin_mask = segment_vote_filter(bin_mask, segms_e, valid,
                                       S_MAX, seg_thresh)

    bin_mask = bin_mask.astype(jnp.float32)
    new_target = coords1 + out["delta"]
    new_weight = jax.nn.sigmoid(out["weight_logits"] +
                                (1.0 - bin_mask) * 10.0) * vm
    new_delta_dy = out["delta_dy"] * (1.0 - bin_mask)
    full_flow = coords1 + new_delta_dy - coords0

    # per-frame damping from graph aggregation (runs in the update
    # op's compute dtype — the reference autocasts GraphAgg too,
    # droid_net.py:64-95 under motion_filter.py:34's autocast)
    m = jnp.where(valid, ii - w0, K).astype(jnp.int32)
    eta, _ = agg_apply(p_agg, net_c, m, K)
    eta = eta.astype(jnp.float32)
    counts = jax.ops.segment_sum(valid.astype(jnp.int32), m,
                                 num_segments=K + 1)[:K]

    return (new_net, new_target, new_weight, raw_mask, new_delta_dy,
            full_flow, eta[..., 0], counts > 0)


def _update_core_chunked(params, poses, disps, intrinsics, fmaps, inps,
                         segms, net_full, target_full, raw_full,
                         dy_full, ii, jj, valid, w0, seg_thresh,
                         update_apply, agg_apply, K, S_MAX,
                         segm_filter, EB, CH):
    """Streaming variant of :func:`_update_core` for the global-BA
    backend (the reference's 8-edge-chunked ``update_lowmem``,
    factor_graph.py:310-360): edges are processed in ``CH``-edge chunks
    inside a fori_loop, so peak activation memory is ONE chunk's
    correlation + GRU tensors while the edge-state buffers (which can
    be bf16) hold the full graph. GraphAgg's scatter-mean accumulates
    across chunks via its pre/post split.

    Returns (net, target, weight, raw, dy, flow [all (EB,...)],
    eta (K,h,w), frame_has_edge (K,)).
    """
    h, w = disps.shape[-2:]
    n_chunks = EB // CH
    p_update, p_agg = params["update"], params["agg"]
    cdt = jax.tree.leaves(p_update)[0].dtype

    coords0 = projective.coords_grid(h, w)
    intr_b = jnp.broadcast_to(intrinsics, (1, poses.shape[0], 4))

    weight_full = jnp.zeros((EB, h, w, 2), jnp.float32)
    flow_full = jnp.zeros((EB, h, w, 2), jnp.float32)
    sum_acc = jnp.zeros((K + 1, h * w * 128), jnp.float32)
    cnt_acc = jnp.zeros((K + 1,), jnp.float32)

    def body(c, carry):
        (net_full, target_full, weight_full, raw_full, dy_full,
         flow_full, sum_acc, cnt_acc) = carry
        o = c * CH
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, o, CH, 0)
        up = lambda a, v: jax.lax.dynamic_update_slice_in_dim(
            a, v.astype(a.dtype), o, 0)

        ii_c, jj_c, valid_c = sl(ii), sl(jj), sl(valid)
        tgt_c = sl(target_full).astype(jnp.float32)
        raw_c = sl(raw_full).astype(jnp.float32)
        dy_c = sl(dy_full).astype(jnp.float32)
        net_c = sl(net_full).astype(jnp.float32)
        vm = valid_c[:, None, None, None].astype(jnp.float32)

        coords1, _ = projective.projective_transform(
            poses[None], disps[None], intr_b, ii_c, jj_c)
        coords1 = coords1[0]

        motn = jnp.concatenate([
            tgt_c - coords0,
            tgt_c - coords0 + dy_c,
            tgt_c - coords1,
            raw_c,
        ], axis=-1)
        motn = jnp.clip(motn, -64.0, 64.0)

        if _use_pallas_corr(h, w):
            from pvo_tpu.vo.net.pallas_corr import pallas_corr_lookup
            corr = pallas_corr_lookup(fmaps[ii_c], fmaps[jj_c], coords1,
                                      packed=True)
        else:
            corr = corr_ops.chunked_corr_lookup(
                fmaps, ii_c, jj_c, coords1, chunk=min(CH, 16))

        inp = inps[ii_c].astype(cdt)
        out = update_apply(p_update, net_c.astype(cdt), inp,
                           corr.astype(cdt), motn.astype(cdt))
        net_cdt = out["net"]
        out = {k: v.astype(jnp.float32) for k, v in out.items()}

        raw_new = raw_c + out["delta_mask"]
        bin_mask = (jax.nn.sigmoid(raw_new) >= DY_THRESH)
        if segm_filter:
            bin_mask = segment_vote_filter(bin_mask, segms[ii_c],
                                           valid_c, S_MAX, seg_thresh)
        bin_mask = bin_mask.astype(jnp.float32)
        tgt_new = coords1 + out["delta"]
        w_new = jax.nn.sigmoid(out["weight_logits"] +
                               (1.0 - bin_mask) * 10.0) * vm
        dy_new = out["delta_dy"] * (1.0 - bin_mask)
        flow_new = coords1 + dy_new - coords0

        m = jnp.where(valid_c, ii_c - w0, K).astype(jnp.int32)
        pre = agg_apply(p_agg, net_cdt, method="pre")
        sum_acc = sum_acc + jax.ops.segment_sum(
            pre.reshape(CH, -1).astype(jnp.float32), m,
            num_segments=K + 1)
        cnt_acc = cnt_acc + jax.ops.segment_sum(
            valid_c.astype(jnp.float32), m, num_segments=K + 1)

        return (up(net_full, out["net"]), up(target_full, tgt_new),
                up(weight_full, w_new), up(raw_full, raw_new),
                up(dy_full, dy_new), up(flow_full, flow_new),
                sum_acc, cnt_acc)

    carry = (net_full, target_full, weight_full, raw_full, dy_full,
             flow_full, sum_acc, cnt_acc)
    (net_full, target_full, weight_full, raw_full, dy_full, flow_full,
     sum_acc, cnt_acc) = jax.lax.fori_loop(0, n_chunks, body, carry)

    adt = jax.tree.leaves(p_agg)[0].dtype
    mean = (sum_acc[:K] / jnp.maximum(cnt_acc[:K, None], 1.0)) \
        .reshape(K, h, w, 128).astype(adt)
    eta, _ = agg_apply(p_agg, mean, method="post")
    eta = eta.astype(jnp.float32)
    return (net_full, target_full, weight_full, raw_full, dy_full,
            flow_full, eta[..., 0], cnt_acc[:K] > 0)


def _fused_body(params, poses, disps, intrinsics, fmaps, nets_buf,
                inps, segms, damping,
                net_full, target_full, weight_full, raw_full, dy_full,
                flow_full, t_inac, w_inac,
                packed, seg_thresh, damp_fac, EP, lm, ep,
                beta, kf_thresh,
                update_apply, agg_apply, K, P, PAIRS, S_MAX,
                segm_filter, corr_chunk, EB, EI, MK, SK,
                iters, motion_only,
                steps=1, steps2=0, WD=0, do_seed=False,
                edge_chunk=None):
    """ONE device program for the whole per-keyframe frontend update:
    ``steps`` consecutive graph updates (recurrent operator + damping
    persistence + fused DBA), then the keyframe-removal distance probe,
    then — keyframe kept (d >= kf_thresh) — ``steps2`` more updates via
    lax.cond (the reference's 4+2 pattern with the branch ON DEVICE,
    droid_frontend.py:52-62), next-pose/disp seeding (:64-66), and the
    sliding-window distance matrix for the NEXT frame's proximity
    proposal. Buffers are donated; the host reads back one small packed
    array per frame, asynchronously. Fresh edges (just added on the
    host) are initialized in-kernel: target <- reprojection, state <-
    zeros, hidden <- video nets (what the reference's add_factors did
    with separate device ops, factor_graph.py:129-157)."""
    F = poses.shape[0]
    h, w = disps.shape[-2:]
    # unpack every per-frame index array from the ONE packed h2d
    # transfer with STATIC slices (free at trace time). Host-side
    # slicing of the packed device array cost ~10 ms/frame: each of
    # the 19 lazy slices was its own relay-dispatched device op.
    _o = [0]

    def _take(ln):
        s = packed[_o[0]:_o[0] + ln]
        _o[0] += ln
        return s

    ii_r, jj_r = _take(EB), _take(EB)
    valid_r = _take(EB).astype(bool)
    fresh_mask = _take(EB).astype(bool)
    ii_ba, jj_ba = _take(EI + EB), _take(EI + EB)
    valid_ba = _take(EI + EB).astype(bool)
    pairs_a, pairs_b = _take(PAIRS), _take(PAIRS)
    pairs_valid = _take(PAIRS).astype(bool)
    dist_i, dist_j = _take(1), _take(1)
    mv_src, mv_dst = _take(MK), _take(MK)
    st_src, st_row = _take(SK), _take(SK)
    st_fresh = _take(SK).astype(bool)
    gsel = _take(EI)
    # varying per-frame scalars ride the same transfer
    # (see _fused: [w0, t0, t1, seed_ix, d0, roll])
    sc = _take(6)
    w0, t0, t1, seed_ix, d0 = (sc[0], sc[1], sc[2], sc[3], sc[4])

    # -------- deferred-retirement prologue --------
    # apply the pending compaction / ring-store plan (recorded by
    # rm_factors since the last step) before anything reads the edge
    # buffers; the BA's inactive extras are then gathered from the
    # UPDATED ring
    (net_full, target_full, weight_full, raw_full, dy_full, flow_full,
     t_inac, w_inac) = _retire_prologue(
        net_full, target_full, weight_full, raw_full, dy_full,
        flow_full, t_inac, w_inac, mv_src, mv_dst, st_src, st_row,
        st_fresh, sc[5])
    if gsel.shape[0]:
        extra_target = t_inac[gsel]
        extra_weight = w_inac[gsel]
    else:
        extra_target = jnp.zeros((0, h, w, 2), jnp.float32)
        extra_weight = jnp.zeros((0, h, w, 2), jnp.float32)

    # -------- fresh-edge initialization --------
    intr_b = jnp.broadcast_to(intrinsics, (1, F, 4))
    coords_new, _ = projective.projective_transform(
        poses[None], disps[None], intr_b, ii_r, jj_r)
    fm = fresh_mask[:, None, None, None]
    target_full = target_full.at[:EB].set(
        jnp.where(fm, coords_new[0], target_full[:EB]))
    zero2 = jnp.zeros((EB, h, w, 2), jnp.float32)
    weight_full = weight_full.at[:EB].set(
        jnp.where(fm, zero2, weight_full[:EB]))
    raw_full = raw_full.at[:EB].set(
        jnp.where(fm, zero2, raw_full[:EB]))
    dy_full = dy_full.at[:EB].set(
        jnp.where(fm, zero2, dy_full[:EB]))
    flow_full = flow_full.at[:EB].set(
        jnp.where(fm, zero2, flow_full[:EB]))
    from pvo_tpu.utils.mxu import gather_rows
    net_full = net_full.at[:EB].set(
        jnp.where(fm, gather_rows(nets_buf, ii_r).astype(net_full.dtype),
                  net_full[:EB]))

    # hoist the all-pairs volumes out of the step loop (they depend
    # only on (fmaps, ii, jj)). Round 1 measured this perf-NEUTRAL
    # because the XLA-built volumes needed a full-HBM relayout copy
    # before extraction; the Pallas builder emits them in extraction
    # layout directly, and the cached path now wins ~11 ms/frame at
    # the 48-edge tracking shapes (6x extract@6.2ms + build@3.5ms vs
    # 6x full-lookup@8.6ms; scripts/bench_corr.py). Costs ~2 GB HBM
    # transiently; wide (x-tiled) streams keep the per-step lookup.
    if _use_pallas_corr(h, w):
        from pvo_tpu.vo.net.pallas_corr import (corr_level_shapes,
                                                pallas_build_volumes)
        vshapes = corr_level_shapes(h, w)
        if all(n_t == 1 and m_t == 1
               for (_, _, n_t, m_t) in vshapes):
            vols = pallas_build_volumes(gather_rows(fmaps, ii_r),
                                        gather_rows(fmaps, jj_r))
            corr_vols = (vols, vshapes)
        else:
            corr_vols = None
    else:
        corr_vols = None

    # hoist the context features' GRU gate contributions out of the
    # 4+2-iteration loop (they depend only on (inps, ii_r))
    if "gru_ctx" in params and edge_chunk is None:
        cdt = jax.tree.leaves(params["update"])[0].dtype
        ctx_pre = gru_ctx_pre(params["gru_ctx"],
                              gather_rows(inps, ii_r).astype(cdt))
    else:
        ctx_pre = None

    # the edge->segment gather is loop-invariant too; XLA lowers it as
    # a sequential row loop (~2.4 ms/frame), so hoist + matmul-gather
    segms_e = gather_rows(segms, ii_r) if edge_chunk is None else None

    def one_step(_, carry):
        (poses, disps, damping, net_full, target_full, weight_full,
         raw_full, dy_full, flow_full) = carry

        if edge_chunk is not None:
            (net, target, weight, raw, dy, flow, eta,
             has_edge) = _update_core_chunked(
                params, poses, disps, intrinsics, fmaps, inps, segms,
                net_full[:EB], target_full[:EB], raw_full[:EB],
                dy_full[:EB], ii_r, jj_r, valid_r, w0, seg_thresh,
                update_apply, agg_apply, K, S_MAX, segm_filter,
                EB, edge_chunk)
        else:
            (net, target, weight, raw, dy, flow, eta,
             has_edge) = _update_core(
                params, poses, disps, intrinsics, fmaps, inps, segms,
                net_full[:EB], target_full[:EB],
                raw_full[:EB], dy_full[:EB], ii_r, jj_r, valid_r, w0,
                seg_thresh, update_apply, agg_apply, K, S_MAX,
                segm_filter, corr_chunk, corr_vols=corr_vols,
                ctx_pre=ctx_pre, segms_e=segms_e)

        net_full = net_full.at[:EB].set(net.astype(net_full.dtype))
        target_full = target_full.at[:EB].set(target)
        weight_full = weight_full.at[:EB].set(weight)
        raw_full = raw_full.at[:EB].set(raw)
        dy_full = dy_full.at[:EB].set(dy)
        flow_full = flow_full.at[:EB].set(flow)

        krows = jnp.clip(w0 + jnp.arange(K), 0, F - 1)
        dwin = jnp.where(has_edge[:, None, None], eta, damping[krows])
        damping = damping.at[krows].set(dwin)

        eta_k = damp_fac * damping[krows] + EP

        target_all = jnp.concatenate(
            [extra_target, target_full[:EB]], 0)
        weight_all = jnp.concatenate(
            [extra_weight, weight_full[:EB]], 0)

        poses, disps = dba_mod.dba(
            poses, disps, intrinsics, target_all, weight_all, eta_k,
            ii_ba, jj_ba, valid_ba, pairs_a, pairs_b, pairs_valid,
            t0, t1, w0, P=P, K=K, iters=iters,
            motion_only=motion_only, ep=ep, lm=lm)

        return (poses, disps, damping, net_full, target_full,
                weight_full, raw_full, dy_full, flow_full)

    carry = (poses, disps, damping, net_full, target_full, weight_full,
             raw_full, dy_full, flow_full)
    carry = jax.lax.fori_loop(0, steps, one_step, carry)

    # post-BA keyframe-distance probe (frontend removal decision)
    from pvo_tpu.geom.distance import (frame_distance,
                                       window_distance_matrix)
    d1 = frame_distance(carry[0], carry[1], intrinsics, dist_i, dist_j,
                        beta)
    d2 = frame_distance(carry[0], carry[1], intrinsics, dist_j, dist_i,
                        beta)
    d = 0.5 * (d1 + d2)

    if steps2 > 0:
        # keyframe kept -> run the remaining updates on-device
        carry = jax.lax.cond(
            d[0] >= kf_thresh,
            lambda c: jax.lax.fori_loop(0, steps2, one_step, c),
            lambda c: c, carry)

    (poses, disps, damping, net_full, target_full, weight_full,
     raw_full, dy_full, flow_full) = carry

    if do_seed:
        poses = poses.at[seed_ix].set(poses[seed_ix - 1])
        disps = disps.at[seed_ix].set(jnp.mean(disps[seed_ix - 1]))

    if WD > 0:
        dmat = window_distance_matrix(poses, disps, intrinsics, d0,
                                      WD, beta)
        packet = jnp.concatenate([d, dmat.reshape(-1)])
    else:
        packet = d

    return (poses, disps, damping, net_full, target_full, weight_full,
            raw_full, dy_full, flow_full, t_inac, w_inac, packet)


_FUSED_STATICS = ("update_apply", "agg_apply", "K", "P", "PAIRS",
                  "S_MAX", "segm_filter", "corr_chunk", "EB",
                  "EI", "MK", "SK",
                  "iters", "motion_only", "steps", "steps2", "WD",
                  "do_seed", "edge_chunk",
                  # per-callsite-constant float knobs: static, so
                  # they stop costing a scalar h2d each dispatch
                  # (~1.6 ms apiece through the remote relay)
                  "seg_thresh", "damp_fac", "EP", "lm", "ep",
                  "beta", "kf_thresh")

_fused_step = functools.partial(
    jax.jit,
    donate_argnames=("poses", "disps", "damping", "net_full",
                     "target_full", "weight_full", "raw_full",
                     "dy_full", "flow_full", "t_inac", "w_inac"),
    static_argnames=_FUSED_STATICS)(_fused_body)


@functools.partial(
    jax.jit,
    donate_argnames=("poses", "disps", "damping", "net_full",
                     "target_full", "weight_full", "raw_full",
                     "dy_full", "flow_full", "t_inac", "w_inac",
                     "fmaps", "nets_buf", "inps", "segms", "images",
                     "intr_buf"),
    static_argnames=_FUSED_STATICS + ("fnet_apply", "cnet_apply",
                                      "mf_first", "mf_thresh"))
def _fused_step_mf(params, mf_params, poses, disps, fmaps, nets_buf,
                   inps, segms, images, intr_buf, damping,
                   net_full, target_full, weight_full, raw_full,
                   dy_full, flow_full, t_inac, w_inac,
                   packed, mf_fmap, mf_net, mf_inp, mf_image,
                   mf_intr8, mf_segm, mf_ix,
                   seg_thresh, damp_fac, EP, lm, ep, beta, kf_thresh,
                   update_apply, agg_apply, fnet_apply, cnet_apply,
                   K, P, PAIRS, S_MAX, segm_filter, corr_chunk,
                   EB, EI, MK, SK, iters, motion_only,
                   steps=1, steps2=0, WD=0, do_seed=False,
                   edge_chunk=None, mf_first=False, mf_thresh=0.0):
    """The merged per-frame program: the motion filter's probe +
    conditional keyframe append for frame t (motion_filter.track_body)
    followed by the fused frontend update for keyframe t-1. One
    dispatch instead of two (~5 ms/frame of host jit-call overhead
    through the remote relay, docs/PERF.md round 3); the in-program
    order (mf first) is exactly the round-2 device-queue order."""
    from pvo_tpu.vo.motion_filter import track_body

    (admitted, mf_state,
     (fmaps, nets_buf, inps, segms, images, poses, disps,
      intr_buf)) = track_body(
        mf_params, mf_fmap, mf_net, mf_inp,
        fmaps, nets_buf, inps, segms, images, poses, disps, intr_buf,
        mf_image, mf_intr8, mf_segm, mf_ix, mf_thresh,
        fnet_apply, cnet_apply, update_apply, mf_first)

    out = _fused_body(
        params, poses, disps, intr_buf[0], fmaps, nets_buf, inps,
        segms, damping, net_full, target_full, weight_full, raw_full,
        dy_full, flow_full, t_inac, w_inac, packed,
        seg_thresh, damp_fac, EP, lm, ep, beta, kf_thresh,
        update_apply, agg_apply, K, P, PAIRS, S_MAX, segm_filter,
        corr_chunk, EB, EI, MK, SK, iters, motion_only,
        steps=steps, steps2=steps2, WD=WD, do_seed=do_seed,
        edge_chunk=edge_chunk)
    return out + (admitted, mf_state, fmaps, nets_buf, inps, segms,
                  images, intr_buf)


def _retire_prologue(net, target, weight, raw, dy, flow, t_inac,
                     w_inac, mv_src, mv_dst, st_src, st_row, st_fresh,
                     roll):
    """Deferred edge-retirement plan, applied in-program: store the
    dropped edges' (target, weight) into the inactive ring (FIFO roll
    by ``roll`` first; dead rows — evicted or padded — scatter
    out-of-bounds and are DROPPED), then SWAP-compact the edge buffers
    (``mv_dst[i] <- mv_src[i]``, all sources read the pre-compaction
    layout; padded pairs write to a dead row). Only O(drops) rows move
    instead of a full-buffer permutation gather (which cost
    ~12 ms/frame at the tracking loop's buffer sizes). Replaces the
    round-1 standalone _rm_edges_kernel dispatch (~20 ms/frame of
    relay overhead)."""
    if st_src.shape[0]:
        fd = st_fresh[:, None, None, None]
        t_new = target[st_src]
        w_new = jnp.where(fd, 0.0, weight[st_src])
        t_inac = jnp.roll(t_inac, -roll, axis=0) \
            .at[st_row].set(t_new, mode="drop")
        w_inac = jnp.roll(w_inac, -roll, axis=0) \
            .at[st_row].set(w_new, mode="drop")

    def compact(buf):
        vals = buf[mv_src]
        return buf.at[mv_dst].set(vals.astype(buf.dtype), mode="drop")

    if mv_src.shape[0]:
        net, target, weight, raw, dy, flow = (
            compact(net), compact(target), compact(weight),
            compact(raw), compact(dy), compact(flow))
    return net, target, weight, raw, dy, flow, t_inac, w_inac


@functools.partial(
    jax.jit,
    donate_argnames=("net", "target", "weight", "raw", "dy", "flow",
                     "t_inac", "w_inac"))
def _apply_pending_kernel(net, target, weight, raw, dy, flow, t_inac,
                          w_inac, mv_src, mv_dst, st_src, st_row,
                          st_fresh, roll):
    """Standalone dispatch of :func:`_retire_prologue` (for edge-buffer
    consumers outside the fused step, e.g. filter_edges)."""
    return _retire_prologue(net, target, weight, raw, dy, flow,
                            t_inac, w_inac, mv_src, mv_dst, st_src,
                            st_row, st_fresh, roll)


class FactorGraph:
    def __init__(self, video, update_module, agg_module, params,
                 max_edges=96, max_inactive=96, corr_chunk=16,
                 max_factors=-1, edge_buckets=None, beta=0.3,
                 pose_buckets=(32, 64, 128, 256, 512),
                 pair_buckets=(512, 2048, 8192, 32768, 131072),
                 edge_chunk=None, net_dtype=jnp.float32):
        """``edge_chunk``: when set, the recurrent update streams over
        edge chunks of this size inside the device program (backend
        scale; reference update_lowmem chunking) — edge buckets must be
        multiples of it. ``net_dtype``: storage dtype of the per-edge
        hidden state (bf16 halves the dominant buffer for big graphs;
        the reference holds it in fp16 under autocast)."""
        self.video = video
        params = dict(params)
        if _use_pallas_corr(video.h, video.w):
            from pvo_tpu.vo.net.pallas_corr import packed_update_params
            params["update"] = packed_update_params(params["update"])
        # ctx-sliced GRU kernels + context slices for the fused step's
        # hoisted gate precompute (see split_gru_ctx_params)
        params["update_nc"], params["gru_ctx"] = \
            split_gru_ctx_params(params["update"])
        self.params = params
        self.beta = beta
        self.max_edges = max_edges
        self.max_inactive = max_inactive
        self.max_factors = max_factors  # reference active-edge cap
        self.corr_chunk = corr_chunk
        self.edge_chunk = edge_chunk
        if edge_buckets is None:
            edge_buckets = tuple(sorted({32, 64, max_edges}))
        self.edge_buckets = tuple(b for b in edge_buckets
                                  if b <= max_edges)
        # finer inactive buckets: the in-window inactive set is usually
        # far below the cap, and BA cost scales with the padded total
        self.inactive_buckets = tuple(sorted(
            {0, 32, max_inactive} if max_inactive > 32
            else {0, max_inactive}))
        self.pose_buckets = pose_buckets
        self.pair_buckets = pair_buckets

        self.update_apply = update_module.apply
        self.agg_apply = agg_module.apply

        h, w = video.h, video.w
        self.h, self.w = h, w

        # host topology
        self.ii = np.zeros(0, np.int64)
        self.jj = np.zeros(0, np.int64)
        self.age = np.zeros(0, np.int64)
        self.ii_inac = np.zeros(0, np.int64)
        self.jj_inac = np.zeros(0, np.int64)
        self.ii_bad = np.zeros(0, np.int64)
        self.jj_bad = np.zeros(0, np.int64)

        # device edge state (padded)
        E = max_edges
        self.net = jnp.zeros((E, h, w, 128), net_dtype)
        self.target_cam = jnp.zeros((E, h, w, 2), jnp.float32)
        self.weight = jnp.zeros((E, h, w, 2), jnp.float32)
        self.raw_mask = jnp.zeros((E, h, w, MASK_NUM), jnp.float32)
        self.delta_dy = jnp.zeros((E, h, w, 2), jnp.float32)
        self.full_flow = jnp.zeros((E, h, w, 2), jnp.float32)

        MI = max_inactive
        self.target_inac = jnp.zeros((MI, h, w, 2), jnp.float32)
        self.weight_inac = jnp.zeros((MI, h, w, 2), jnp.float32)

        # host mark: edge rows added since the last fused step; their
        # device state is initialized inside the next _fused_step
        self.fresh = np.zeros(0, bool)

        # deferred-retirement state: _loc[e] = device row (in the
        # last-flushed layout) currently holding edge e's state
        # (-1 = fresh, no device state yet); _pend_store = FIFO of
        # (device_row, fresh) ring stores; _ring_evict = pending FIFO
        # evictions; _ring_base = ring size at the last flush
        self._loc = np.zeros(0, np.int64)
        self._pend_store = []
        self._ring_evict = 0
        self._ring_base = 0
        # (admitted, mf_state) of the last merged-mf fused step
        self._last_mf = None

    # ---------------- host topology ops ----------------

    @property
    def n_edges(self):
        return len(self.ii)

    def _existing(self):
        return set(zip(self.ii.tolist(), self.jj.tolist())) | \
            set(zip(self.ii_inac.tolist(), self.jj_inac.tolist()))

    def add_factors(self, ii, jj, remove=False):
        ii = np.asarray(ii, np.int64).reshape(-1)
        jj = np.asarray(jj, np.int64).reshape(-1)
        eset = self._existing()
        keep = [k for k in range(len(ii))
                if (ii[k], jj[k]) not in eset]
        ii, jj = ii[keep], jj[keep]
        if len(ii) == 0:
            return

        # active-edge cap (reference factor_graph.py:122-127): retire
        # edges exactly like the reference does — its mask is
        # ``argsort(age) >= max_factors - len(new)`` applied in EDGE
        # order (edge k drops iff the index of the k-th-youngest edge
        # clears the cap — a permutation quirk of the reference that
        # coincides with oldest-first only when age is monotone in
        # insertion order; replicated verbatim so the decision traces
        # match, tests/test_decision_trace.py)
        if remove and self.max_factors > 0 and \
                self.n_edges + len(ii) > self.max_factors:
            drop = np.argsort(self.age, kind="stable") >= \
                self.max_factors - len(ii)
            self.rm_factors(drop, store=True)

        # enforce buffer capacity: evict oldest (store as inactive).
        # The reference graph grows unboundedly when remove=False; with
        # static buffers we instead retire the oldest edges to the
        # inactive store (they still participate in BA via
        # use_inactive), which degrades gracefully.
        overflow = self.n_edges + len(ii) - self.max_edges
        if overflow > 0:
            order = np.argsort(-self.age)  # oldest first
            drop = np.zeros(self.n_edges, bool)
            drop[order[:overflow]] = True
            self.rm_factors(drop, store=True)

        # device-state initialization happens inside the next
        # _fused_step (fresh_mask) — adding edges is pure host work
        self.ii = np.concatenate([self.ii, ii])
        self.jj = np.concatenate([self.jj, jj])
        self.age = np.concatenate([self.age, np.zeros(len(ii), np.int64)])
        self.fresh = np.concatenate([self.fresh, np.ones(len(ii), bool)])
        self._loc = np.concatenate([self._loc,
                                    np.full(len(ii), -1, np.int64)])

    DROP_BUCKETS = (8, 32, 96)

    def rm_factors(self, mask, store=False):
        """Retire edges. HOST-ONLY: the device-buffer compaction and
        the inactive-ring stores are DEFERRED — recorded in
        ``_loc``/``_pend_store`` and applied as a prologue of the next
        ``_fused_step`` (or by :meth:`flush_compaction`). A standalone
        per-retirement device dispatch cost ~20 ms/frame of relay
        overhead in the tracking loop (docs/PERF.md)."""
        mask = np.asarray(mask, bool)
        k = int(mask.sum())
        if k == 0:
            return
        drop_idx = np.nonzero(mask)[0]
        if store:
            # record the ring stores in FIFO append order: src = the
            # dropped edge's device row in the last-flushed layout
            # (-1 = fresh, no device state yet -> weight stored as 0)
            for d in drop_idx:
                self._pend_store.append(
                    (int(self._loc[d]),
                     bool(self.fresh[d]) or self._loc[d] < 0))
            # FIFO append with eviction of the oldest entries (which
            # can include just-appended ones when k > max_inactive);
            # the device roll amount is resolved at flush time
            ni = len(self.ii_inac)
            over = ni + k - self.max_inactive
            if over > 0:
                self._ring_evict += over
            self.ii_inac = np.concatenate(
                [self.ii_inac, self.ii[mask]])[-self.max_inactive:]
            self.jj_inac = np.concatenate(
                [self.jj_inac, self.jj[mask]])[-self.max_inactive:]

        if k == len(mask) == self.n_edges:
            # dropping EVERYTHING: pure host bookkeeping (any pending
            # ring stores still read the edges' old device rows at
            # flush, before fresh rows are initialized)
            self.ii = np.zeros(0, np.int64)
            self.jj = np.zeros(0, np.int64)
            self.age = np.zeros(0, np.int64)
            self.fresh = np.zeros(0, bool)
            self._loc = np.zeros(0, np.int64)
            return

        # swap-compaction plan: surviving rows >= n_new fill the holes
        # below n_new (order of edges does not matter anywhere — NMS,
        # BA assembly and per-edge updates are set-semantics)
        n = len(mask)
        n_new = n - k
        drop_set = set(drop_idx.tolist())
        holes = [d for d in drop_idx if d < n_new]
        movers = [r for r in range(n_new, n) if r not in drop_set]
        assert len(holes) == len(movers), (holes, movers)

        # mirror the swap on the host topology arrays; ``_loc`` keeps
        # pointing at each edge's ORIGINAL device row, so all deferred
        # plans stay expressed in last-flushed-layout coordinates
        for name in ("ii", "jj", "age", "fresh", "_loc"):
            arr = getattr(self, name).copy()
            arr[holes] = arr[movers]
            setattr(self, name, arr[:n_new])

    def _pending_plan(self):
        """Padded (moves, ring-stores, roll) plan for the deferred
        retirements since the last flush, in last-flushed-layout
        coordinates. Returns None when nothing is pending."""
        n = self.n_edges
        mv = [(int(self._loc[e]), e) for e in range(n)
              if 0 <= self._loc[e] != e]
        kk = len(self._pend_store)
        if not mv and not kk and not self._ring_evict:
            return None
        ni_final = len(self.ii_inac)
        # FIFO ring: evictions pop OLD entries first; pendings appended
        # at the tail. evicted_old = how far the old content rolls;
        # only the last `surv` pendings landed inside the ring
        evicted_old = min(self._ring_base, self._ring_evict)
        surv = kk - (self._ring_evict - evicted_old)
        assert ni_final == self._ring_base - evicted_old + surv

        bk = lambda q: _bucket(q, self.DROP_BUCKETS + (self.max_edges,)
                               if q > self.DROP_BUCKETS[-1]
                               else self.DROP_BUCKETS) if q else 0
        MK, SK = bk(len(mv)), bk(kk)
        mv_src = np.zeros(MK, np.int64)
        mv_dst = np.full(MK, self.max_edges, np.int64)   # dead row
        for q, (s, d) in enumerate(mv):
            mv_src[q], mv_dst[q] = s, d
        st_src = np.zeros(SK, np.int64)
        st_row = np.full(SK, self.max_inactive, np.int64)  # dead row
        st_fresh = np.zeros(SK, bool)
        for p, (src, fr) in enumerate(self._pend_store):
            q = p - (kk - surv)
            st_src[p] = max(src, 0)
            st_fresh[p] = fr
            if q >= 0:
                st_row[p] = ni_final - surv + q
        return mv_src, mv_dst, st_src, st_row, st_fresh, evicted_old

    def _mark_flushed(self):
        self._loc = np.arange(self.n_edges, dtype=np.int64)
        self._pend_store = []
        self._ring_evict = 0
        self._ring_base = len(self.ii_inac)

    def flush_compaction(self):
        """Apply any deferred retirement plan with a standalone device
        program (for consumers of the edge buffers outside the fused
        step; the fused step applies it as an in-program prologue).
        Fresh (never-updated) edges keep uninitialized device rows, as
        before deferral."""
        plan = self._pending_plan()
        if plan is None:
            return
        mv_src, mv_dst, st_src, st_row, st_fresh, roll = plan
        (self.net, self.target_cam, self.weight, self.raw_mask,
         self.delta_dy, self.full_flow, self.target_inac,
         self.weight_inac) = _apply_pending_kernel(
            self.net, self.target_cam, self.weight, self.raw_mask,
            self.delta_dy, self.full_flow, self.target_inac,
            self.weight_inac, jnp.asarray(mv_src), jnp.asarray(mv_dst),
            jnp.asarray(st_src), jnp.asarray(st_row),
            jnp.asarray(st_fresh), roll)
        # after the standalone flush every non-fresh edge sits at its
        # host position; fresh edges still await their fused-step init
        self._loc = np.where(self._loc >= 0,
                             np.arange(self.n_edges, dtype=np.int64),
                             -1)
        self._pend_store = []
        self._ring_evict = 0
        self._ring_base = len(self.ii_inac)

    # NOTE: keyframe removal lives in Frontend.rm_keyframe_deferred
    # (it must shift EVERY slot above the removed one, including the
    # speculative append and the next-frame seed).

    def filter_edges(self):
        """Drop long-range edges with negligible confidence
        (reference factor_graph.py:92-99)."""
        if self.n_edges == 0:
            return
        self.flush_compaction()
        conf = np.asarray(jnp.mean(
            self.weight[: self.n_edges], axis=(1, 2, 3)))
        mask = (np.abs(self.ii - self.jj) > 2) & (conf < 0.001)
        self.ii_bad = np.concatenate([self.ii_bad, self.ii[mask]])
        self.jj_bad = np.concatenate([self.jj_bad, self.jj[mask]])
        self.rm_factors(mask, store=False)

    def clear_edges(self):
        self.rm_factors(np.ones(self.n_edges, bool), store=False)

    # ---------------- graph construction ----------------

    def add_neighborhood_factors(self, t0, t1, r=3):
        ii, jj = np.meshgrid(np.arange(t0, t1), np.arange(t0, t1),
                             indexing="ij")
        ii, jj = ii.reshape(-1), jj.reshape(-1)
        keep = (np.abs(ii - jj) > 0) & (np.abs(ii - jj) <= r)
        self.add_factors(ii[keep], jj[keep])

    def add_proximity_factors(self, t0=0, t1=0, rad=2, nms=2, beta=0.25,
                              thresh=16.0, remove=False,
                              max_new=None, distance_fn=None):
        """Distance-based edge proposal with NMS suppression
        (reference factor_graph.py:372-429). ``distance_fn``: optional
        host-side pair-distance source (the frontend's packet matrix)
        replacing the synchronous device call."""
        t = self.video.counter
        ix = np.arange(t0, t)
        jx = np.arange(t1, t)
        if len(ix) == 0 or len(jx) == 0:
            return
        ii, jj = np.meshgrid(ix, jx, indexing="ij")
        ii, jj = ii.reshape(-1), jj.reshape(-1)

        if distance_fn is not None:
            d = np.asarray(distance_fn(ii, jj), np.float64).copy()
        else:
            d = np.asarray(self.video.distance(ii, jj, beta=beta),
                           np.float64).copy()
        d[ii - rad < jj] = np.inf
        d[d > 100] = np.inf

        # diamond-NMS suppression (|di|+|dj| <= r around each edge),
        # vectorized: one fancy-indexed write per distinct radius
        # instead of a python double loop per edge — the reference's
        # per-edge loops (factor_graph.py:380-427) cost host seconds
        # at backend scale (300+ keyframes)
        offs = {rv: np.array(
            [(di, dj) for di in range(-nms, nms + 1)
             for dj in range(-nms, nms + 1)
             if abs(di) + abs(dj) <= rv], np.int64).reshape(-1, 2)
            for rv in range(nms + 1)}

        def suppress(si, sj):
            si = np.asarray(si, np.int64).reshape(-1)
            sj = np.asarray(sj, np.int64).reshape(-1)
            r = np.clip(np.abs(si - sj) - 2, 0, nms)
            for rv in np.unique(r):
                o = offs[int(rv)]
                sel = r == rv
                i1 = si[sel][:, None] + o[None, :, 0]
                j1 = sj[sel][:, None] + o[None, :, 1]
                ok = ((i1 >= t0) & (i1 < t) & (j1 >= t1) & (j1 < t))
                d[(i1[ok] - t0) * (t - t1) + (j1[ok] - t1)] = np.inf

        ei = np.concatenate([self.ii, self.ii_bad, self.ii_inac])
        ej = np.concatenate([self.jj, self.jj_bad, self.jj_inac])
        lr = np.abs(ei - ej) > 2
        suppress(ei[lr], ej[lr])

        es = []
        for i in range(t0, t):
            for j in range(i + 1, min(i + rad + 1, t)):
                es.append((i, j))
                es.append((j, i))

        # greedy accept in distance order; only candidates initially
        # under thresh can ever be accepted (suppression only raises
        # d), so the scan is bounded by their count, not t^2
        order = np.argsort(d)[: int(np.count_nonzero(d <= thresh))]
        for k in order:
            if d[k] > thresh:
                continue
            if max_new is not None and len(es) >= 2 * max_new:
                break
            i, j = int(ii[k]), int(jj[k])
            es.append((i, j))
            es.append((j, i))
            suppress(i, j)

        if es:
            es = np.asarray(es, np.int64)
            self.add_factors(es[:, 0], es[:, 1], remove)

    # ---------------- the update ----------------

    def _padded_edges(self, EB=None):
        n = self.n_edges
        if EB is None:
            EB = _bucket(n, self.edge_buckets)
        ii = np.zeros(EB, np.int32)
        jj = np.zeros(EB, np.int32)
        valid = np.zeros(EB, bool)
        ii[:n] = self.ii
        jj[:n] = self.jj
        valid[:n] = True
        return ii, jj, valid

    def update(self, t0=None, t1=None, itrs=2, use_inactive=False,
               EP=1e-7, motion_only=False, steps=1, dist_pair=None,
               steps2=0, kf_thresh=0.0, seed_ix=None, dmat_window=0,
               mf=None):
        """``steps`` consecutive updates run inside one device program
        (the reference loops graph.update() on the host,
        droid_frontend.py:48-62). ``dist_pair``: optional (i, j) whose
        post-BA bidirectional frame distance is returned as a device
        scalar (keyframe-removal probe, saving a round-trip).
        ``steps2``: extra updates executed ON DEVICE only when the
        probe distance >= kf_thresh (frontend keep-keyframe branch).
        ``seed_ix``: slot seeded with the previous pose / mean disp.
        ``dmat_window``: if > 0, append the window distance matrix to
        the returned packet. ``mf``: optional motion-filter work dict
        (see _fused) riding the same program; its (admitted, state)
        result is stored in ``self._last_mf``."""
        if self.n_edges == 0:
            return None, 0
        if t0 is None:
            t0 = max(1, int(self.ii.min()) + 1)
        if t1 is None:
            t1 = int(max(self.ii.max(), self.jj.max())) + 1
        d = self._fused(t0, t1, itrs=itrs, use_inactive=use_inactive,
                        EP=EP, motion_only=motion_only,
                        lm=1e-4, ep=0.1, damp_fac=0.2, steps=steps,
                        dist_pair=dist_pair, steps2=steps2,
                        kf_thresh=kf_thresh, seed_ix=seed_ix,
                        dmat_window=dmat_window, mf=mf)
        # the steps2 extra updates only run on device when the probe
        # KEEPS the keyframe (reference droid_frontend.py:52-62 ages
        # edges per executed update); the caller credits +steps2 at
        # packet-resolve time via age_credit()
        self.age += steps
        return d, self._last_d0

    def age_credit(self, extra):
        """Add deferred update-age (the conditional steps2 that the
        device's keep-keyframe branch executed last frame)."""
        self.age += extra

    def update_lowmem(self, t0=None, t1=None, itrs=2, EP=1e-7, steps=8):
        """Global-BA update loop (reference update_lowmem,
        factor_graph.py:310-360): same fused step looped on-device,
        lighter damping (lm=1e-5, ep=1e-2, damp factor 1.0)."""
        t0_ = max(1, int(self.ii.min()) + 1) if t0 is None else t0
        t1_ = int(self.video.counter) if t1 is None else t1
        self._fused(t0_, t1_, itrs=itrs, use_inactive=False,
                    EP=EP, motion_only=False, lm=1e-5, ep=1e-2,
                    damp_fac=1.0, steps=steps)

    def _fused(self, t0, t1, itrs, use_inactive, EP, motion_only,
               lm, ep, damp_fac, steps=1, dist_pair=None, steps2=0,
               kf_thresh=0.0, seed_ix=None, dmat_window=0, mf=None):
        """Host prep (numpy index work only) + ONE device call.

        ``mf``: optional motion-filter work for the incoming frame
        (dict from MotionFilter.prepare + params/apply fns) — merged
        into the same device program as its prologue
        (_fused_step_mf)."""
        v = self.video
        h, w = self.h, self.w
        n = self.n_edges

        EB = _bucket(n, self.edge_buckets)
        ii_r, jj_r, valid_r = self._padded_edges(EB)
        fresh = np.zeros(EB, bool)
        fresh[:n] = self.fresh
        self.fresh[:] = False
        if dist_pair is None:
            dist_pair = (0, 0)
        do_seed = seed_ix is not None
        if seed_ix is None:
            seed_ix = 0
        d0 = max(0, int(v.counter) + 1 - dmat_window) \
            if dmat_window else 0

        # deferred retirement plan, applied as the step's prologue
        plan = self._pending_plan()
        if plan is None:
            MK = SK = 0
            mv_src = mv_dst = np.zeros(0, np.int64)
            st_src = st_row = np.zeros(0, np.int64)
            st_fresh = np.zeros(0, np.int64)
            roll = 0
        else:
            mv_src, mv_dst, st_src, st_row, st_fresh, roll = plan
            MK, SK = len(mv_src), len(st_src)

        # inactive edges participating in BA (gathered in-program,
        # AFTER the prologue lands this frame's ring stores)
        if use_inactive and len(self.ii_inac) > 0:
            m = (self.ii_inac >= t0 - 3) & (self.jj_inac >= t0 - 3)
            sel = np.nonzero(m)[0]
        else:
            sel = np.zeros(0, np.int64)
        EI = _bucket(len(sel), self.inactive_buckets)
        sel_pad = np.concatenate(
            [sel, np.zeros(EI - len(sel), np.int64)])

        # BA edge set = [inactive | active], padded to EI + EB
        ii_ba = np.zeros(EI + EB, np.int32)
        jj_ba = np.zeros(EI + EB, np.int32)
        valid_ba = np.zeros(EI + EB, bool)
        ii_ba[:len(sel)] = self.ii_inac[sel]
        jj_ba[:len(sel)] = self.jj_inac[sel]
        valid_ba[:len(sel)] = True
        ii_ba[EI:EI + n] = self.ii
        jj_ba[EI:EI + n] = self.jj
        valid_ba[EI:EI + n] = True

        all_ii = ii_ba[valid_ba]
        w0 = int(all_ii.min())
        K = _bucket(int(all_ii.max()) - w0 + 1, self.pose_buckets)
        P = _bucket(int(t1 - t0), self.pose_buckets)

        from collections import Counter
        cnt = Counter(all_ii.tolist())
        PAIRS = _bucket(sum(c * c for c in cnt.values()),
                        self.pair_buckets)
        pa, pb, pv = dba_mod.build_edge_pairs(ii_ba, valid_ba, PAIRS)

        # ONE packed h2d transfer for all index arrays (each small
        # device_put costs ~1.6 ms through a remote tunnel)
        packed_idx = jnp.asarray(np.concatenate([
            ii_r, jj_r, valid_r.astype(np.int32),
            fresh.astype(np.int32),
            ii_ba, jj_ba, valid_ba.astype(np.int32),
            pa, pb, pv.astype(np.int32),
            np.asarray([dist_pair[0], dist_pair[1]], np.int32),
            mv_src, mv_dst, st_src, st_row, st_fresh,
            sel_pad,
            # varying per-frame scalars ride the same transfer (the
            # float knobs are static jit args; these ints change every
            # frame and would otherwise each pay a separate h2d)
            np.asarray([w0, t0, t1, int(seed_ix), d0, roll]),
        ]).astype(np.int32))

        kw = dict(
            update_apply=self.update_apply, agg_apply=self.agg_apply,
            K=K, P=P, PAIRS=PAIRS, S_MAX=v.max_segments,
            segm_filter=v.segm_filter, corr_chunk=self.corr_chunk,
            EB=EB, EI=EI, MK=MK, SK=SK,
            iters=itrs, motion_only=motion_only, steps=steps,
            steps2=steps2, WD=dmat_window, do_seed=do_seed,
            edge_chunk=(self.edge_chunk
                        if self.edge_chunk and
                        EB % self.edge_chunk == 0 and
                        EB > self.edge_chunk else None))
        floats = (float(v.thresh), float(damp_fac), float(EP),
                  float(lm), float(ep), float(self.beta),
                  float(kf_thresh))
        mf_out = None
        if mf is not None:
            (v.poses, v.disps, v.damping, self.net, self.target_cam,
             self.weight, self.raw_mask, self.delta_dy,
             self.full_flow, self.target_inac, self.weight_inac,
             packet, admitted, mf_state, v.fmaps, v.nets, v.inps,
             v.segms, v.images, v.intrinsics) = _fused_step_mf(
                self.params, mf["params"], v.poses, v.disps, v.fmaps,
                v.nets, v.inps, v.segms, v.images, v.intrinsics,
                v.damping,
                self.net, self.target_cam, self.weight, self.raw_mask,
                self.delta_dy, self.full_flow,
                self.target_inac, self.weight_inac,
                packed_idx, mf["fmap"], mf["net"], mf["inp"],
                mf["image"], mf["intr8"], mf["segm"], v.counter,
                *floats,
                fnet_apply=mf["fnet_apply"],
                cnet_apply=mf["cnet_apply"],
                mf_first=mf["first"], mf_thresh=mf["thresh"], **kw)
            mf_out = (admitted, mf_state)
        else:
            (v.poses, v.disps, v.damping, self.net, self.target_cam,
             self.weight, self.raw_mask, self.delta_dy,
             self.full_flow, self.target_inac, self.weight_inac,
             packet) = _fused_step(
                self.params, v.poses, v.disps, v.intrinsics[0],
                v.fmaps, v.nets, v.inps, v.segms, v.damping,
                self.net, self.target_cam, self.weight, self.raw_mask,
                self.delta_dy, self.full_flow,
                self.target_inac, self.weight_inac,
                packed_idx, *floats, **kw)
        # the prologue applied all deferred retirements; every edge row
        # (incl. fresh inits) now matches the host layout
        self._mark_flushed()
        # single source of truth for the dmat origin the caller must
        # use to interpret the packet's distance matrix
        self._last_d0 = d0
        self._last_mf = mf_out
        return packet
