"""Dynamic MIL refinement: proposal bags -> denoising regression -> bag
classification -> top-k weighted selection.

Capability targets in fcos_head_p2b_ts.py:
- mil_bag_extensive (:1182): bag expansion + RoIAlign + reg tower + DeltaXYWH
  decode + DN-DIoU denoising loss
- mil_bag_classifier (:1240): RoIAlign on refined bags + bag tower -> cls/ins
- mil_bag_training (:1147): bag score = sum_U2(sigmoid(cls) * masked softmax
  (ins)), gfocal positive-bag loss + negative-bag loss
- mil_bag_selection (:1092-1145): top-k weighted merge, beta-blend with input
- forward_mil_head / MIL_head_burn_in_step{1,2} (:1259-1344)

Everything is batched: all bags of all images go through the FC towers as one
[B*G*U1*U2, 7*7*C] x [12544, 1024] matmul (MXU-shaped).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.boxes import bbox_overlaps, xyxy_to_cxcywh
from ..ops.losses import dn_diou_loss, gfocal_loss
from ..ops.roi_align import roi_align
from ..core.proposals import FineProposalCfg, delta_decode, fine_proposals, negative_proposals

Array = jnp.ndarray


class MILStageOut(NamedTuple):
    refined_boxes: Array  # [B, G, 4]
    loss_mil_bbox: Array
    loss_mil_bags: Array
    coarse_bags_iou: Array
    refine_bags_iou: Array
    # fraction of valid refined bag members whose sample grid fits the shared
    # group window of the grouped cls pool (1.0 = the window clamp never
    # bites and the grouped pool is exactly the per-roi pool). 1.0 when the
    # cls pool did not run (with_bags_loss=False).
    cls_pool_coverage: Array = 1.0


def _masked_mean(x: Array, mask: Array) -> Array:
    denom = jnp.maximum(mask.sum(), 1)
    return jnp.where(mask, x, 0.0).sum() / denom


def _group_window_coverage(boxes_xyxy, valid, centers, feat_hw, window,
                           scale=1.0 / 8):
    """Fraction of valid members whose bilinear sample support fits the shared
    group window (conservative 2-cell margin). In-map extent only: at the map
    border the window clips exactly like the map does, so out-of-map samples
    are handled identically by the grouped and per-roi pools."""
    h, w = feat_hw
    cy = centers[..., 1] * scale
    cx = centers[..., 0] * scale
    wy0 = jnp.clip(jnp.floor(cy - window / 2), 0, max(h - window, 0))
    wx0 = jnp.clip(jnp.floor(cx - window / 2), 0, max(w - window, 0))
    x1 = boxes_xyxy[..., 0] * scale
    y1 = boxes_xyxy[..., 1] * scale
    x2 = boxes_xyxy[..., 2] * scale
    y2 = boxes_xyxy[..., 3] * scale
    fit = ((jnp.maximum(y1 - 2, 0) >= wy0[..., None])
           & (jnp.minimum(y2 + 2, h - 1) <= wy0[..., None] + window - 1)
           & (jnp.maximum(x1 - 2, 0) >= wx0[..., None])
           & (jnp.minimum(x2 + 2, w - 1) <= wx0[..., None] + window - 1))
    denom = jnp.maximum(valid.sum(), 1)
    return jnp.where(valid, fit, False).sum() / denom


def mil_stage_rotated(
    mil_regress,
    mil_classify,
    mil_classify_neg,
    mil_feat: Array,
    rboxes: Array,          # [B, G, 5] (cx, cy, w, h, a)
    labels: Array,
    boxes_valid: Array,
    real_rboxes: Array,     # [B, G, 5]
    fine_cfg: FineProposalCfg,
    ext_cfg: FineProposalCfg,
    stage: int,
    img_hw,
    top_k: int,
    beta: float,
    dn_hyper: float,
    neg_key,
    with_bags_loss: bool,
    roi_chunk: int = 1024,
    window: int = 16,
    grouped: bool = True,
):
    """Rotated MIL stage (rotated_fcos_head_p2rb_ts.py mil_bag_* :1198-1365).

    Bags are rotated boxes whose (w, h) come from jittering the axis-aligned
    (cx, cy, w, h) part while the pseudo angle is carried through
    (MIL_gen_proposals_from_cfg OBB :26-41). Pooling uses RoIAlignRotated; the
    regression tower refines the HBB part with the DN-DIoU denoising loss and
    the angle is re-attached; selection merges 5-dim boxes.
    """
    from ..ops.boxes import cxcywh_to_xyxy, xyxy_to_cxcywh
    from ..ops.roi_align import roi_align_rotated_matmul
    from ..ops.rotated import rbox_iou

    b, g = rboxes.shape[:2]
    hw = img_hw

    hbb = cxcywh_to_xyxy(rboxes[..., :4])
    props, props_valid = jax.vmap(lambda bx: fine_proposals(bx, fine_cfg, hw))(hbb)
    u1 = props.shape[2]
    angles1 = jnp.broadcast_to(rboxes[..., None, 4], (b, g, u1))
    ext, ext_valid = jax.vmap(
        lambda bx: fine_proposals(bx.reshape(-1, 4), ext_cfg, hw)
    )(props)
    u2 = ext.shape[2]
    ext = ext.reshape(b, g, u1, u2, 4)
    ext_valid = ext_valid.reshape(b, g, u1, u2) & boxes_valid[:, :, None, None]
    ext_angle = jnp.broadcast_to(angles1[..., None], (b, g, u1, u2))
    ext_rb = jnp.concatenate(
        [xyxy_to_cxcywh(ext), ext_angle[..., None]], -1
    )  # [B, G, U1, U2, 5]

    ext_ref = jnp.broadcast_to(rboxes[:, :, None, None, :], ext_rb.shape)
    ext_real = jnp.broadcast_to(real_rboxes[:, :, None, None, :], ext_rb.shape)
    vmask4 = jnp.broadcast_to(boxes_valid[:, :, None, None], ext_rb.shape[:-1])

    coarse_bags_iou = _masked_mean(
        rbox_iou(ext_rb.reshape(-1, 5), ext_real.reshape(-1, 5), aligned=True),
        vmask4.reshape(-1),
    )

    def pool(feat, rr):
        # per-roi windowed pool (negatives, and the grouped=False fallback).
        # window=16 cells = 128px coverage — SODA-A objects top out near 45px
        # (Normal split <= 2000px^2); larger boxes clamp to the window border.
        # Per-roi the window is centred on EACH roi, so it only bites when a
        # single box exceeds window*stride px (vs the grouped pool, which also
        # bites when members drift from the group centre).
        return roi_align_rotated_matmul(feat, rr, out_size=7, spatial_scale=1.0 / 8,
                                        chunk=256, window=window)

    gctr = rboxes[..., :2]  # [B, G, 2]
    feat_hw = (mil_feat.shape[1], mil_feat.shape[2])
    if grouped:
        # grouped shared-window rotated pool, single-shot (chunk=G: the
        # lax.map chunk loop was the serializer — NOTES_r3 pool bisect). All
        # bag members of one GT share its centre (fine_proposals ratio-scales
        # w/h, the angle is carried), so one window gather serves the whole
        # bag — and BOTH pools of the stage (reg bags + their DN-refined cls
        # bags share the GT-centred window; r5, see mil_stage), and the
        # member contraction gets a tall MXU M (U*ss^2 rows).
        # window=16 = 128px coverage is exact for rotated members up to ~73px
        # per-axis AABB — beyond the whole SODA-A range (<=45px * ratio 1.3).
        # `grouped=False` (cfg.mil_pool_grouped) selects the per-roi path —
        # the fallback when a dataset breaks the group-window assumption.
        from ..ops.roi_align import (
            extract_group_windows, roi_align_rotated_grouped_from_windows)

        win, wy0, wx0 = jax.vmap(
            lambda f, c_: extract_group_windows(f, c_, window=window)
        )(mil_feat, gctr)

        def gpool_win(w_, y0, x0, rr):
            return roi_align_rotated_grouped_from_windows(
                w_, y0, x0, rr, feat_hw, out_size=7, spatial_scale=1.0 / 8,
                chunk=rr.shape[0])

        roi_feats = jax.vmap(gpool_win)(
            win, wy0, wx0, ext_rb.reshape(b, g, u1 * u2, 5)
        ).reshape(b, g * u1 * u2, 7, 7, -1)
    else:
        roi_feats = jax.vmap(
            lambda f, rr: pool(f, rr.reshape(-1, 5)).reshape(
                g, u1 * u2, 7, 7, -1)
        )(mil_feat, ext_rb.reshape(b, g, u1 * u2, 5)).reshape(
            b, g * u1 * u2, 7, 7, -1)
    n = roi_feats.shape[1]
    deltas = mil_regress(roi_feats.reshape(b * n, 7, 7, -1), stage)
    pred_hbb = delta_decode(ext.reshape(b * n, 4), deltas, hw)  # xyxy

    ref_hbb = cxcywh_to_xyxy(ext_ref[..., :4]).reshape(-1, 4)
    w_valid = ext_valid.astype(pred_hbb.dtype)
    avg = jnp.maximum((boxes_valid.sum() * u1 * u2).astype(pred_hbb.dtype), 1.0)
    # base_valid: the reference passes only real-GT bag rows to the DN loss
    # (mil_bag_extensive concatenates ragged per-image bags) — the scalar-mean
    # base runs over them, including in-image-invalid (weight-0) members
    loss_mil_bbox = dn_diou_loss(
        pred_hbb, ref_hbb, weight=w_valid.reshape(-1), avg_factor=avg, hyper=dn_hyper,
        base_valid=vmask4.reshape(-1),
    )

    pred_d = jax.lax.stop_gradient(pred_hbb)
    refined_rb = jnp.concatenate(
        [xyxy_to_cxcywh(pred_d).reshape(b, g, u1, u2, 4), ext_angle[..., None]], -1
    )
    refine_bags_iou = _masked_mean(
        rbox_iou(refined_rb.reshape(-1, 5), ext_real.reshape(-1, 5), aligned=True),
        vmask4.reshape(-1),
    )

    if not with_bags_loss:
        return MILStageOut(rboxes, loss_mil_bbox, jnp.zeros(()), coarse_bags_iou,
                           refine_bags_iou)

    rb5 = refined_rb.reshape(b, g, u1 * u2, 5)
    # member AABB (rotated extent) for the window-coverage diagnostic
    hw_x = (jnp.abs(rb5[..., 2] * jnp.cos(rb5[..., 4]))
            + jnp.abs(rb5[..., 3] * jnp.sin(rb5[..., 4]))) / 2
    hw_y = (jnp.abs(rb5[..., 2] * jnp.sin(rb5[..., 4]))
            + jnp.abs(rb5[..., 3] * jnp.cos(rb5[..., 4]))) / 2
    aabb = jnp.stack([rb5[..., 0] - hw_x, rb5[..., 1] - hw_y,
                      rb5[..., 0] + hw_x, rb5[..., 1] + hw_y], -1)
    if grouped:
        # refined bags pooled from the SAME per-GT windows as the reg bags
        # (one gather serves both pools); coverage measured against those
        # actual window origins
        cls_pool_coverage = _group_window_coverage(
            aabb, ext_valid.reshape(b, g, u1 * u2), gctr, feat_hw,
            window=window)
        roi_feats_cls = jax.vmap(gpool_win)(
            win, wy0, wx0, rb5
        ).reshape(b, n, 7, 7, -1)
    else:
        cls_pool_coverage = jnp.ones(())
        roi_feats_cls = jax.vmap(
            lambda f, rr: pool(f, rr.reshape(-1, 5)).reshape(
                g, u1 * u2, 7, 7, -1)
        )(mil_feat, rb5).reshape(b, n, 7, 7, -1)
    # negatives fold into the bag-tower call (same weights — see mil_stage)
    use_neg = (mil_classify_neg is not None and neg_key is not None
               and fine_cfg.gen_num_neg > 0)
    if use_neg:
        nn_ = fine_cfg.gen_num_neg
        keys = jax.random.split(neg_key, b)
        neg, neg_w = jax.vmap(
            lambda k, p, v: negative_proposals(k, p, v, nn_, hw)
        )(keys, props, props_valid & boxes_valid[:, :, None])
        neg_rb = jnp.concatenate(
            [xyxy_to_cxcywh(neg), jnp.zeros((*neg.shape[:-1], 1), neg.dtype)], -1
        )
        neg_feats = jax.vmap(pool)(mil_feat, neg_rb)
        all_feats = jnp.concatenate(
            [roi_feats_cls.reshape(b * n, 7, 7, roi_feats_cls.shape[-1]),
             neg_feats.reshape(b * nn_, 7, 7, neg_feats.shape[-1])], axis=0)
        cls_all, ins_all = mil_classify(all_feats, stage)
        cls_score, ins_score = cls_all[:b * n], ins_all[:b * n]
        neg_cls = cls_all[b * n:]
    else:
        cls_score, ins_score = mil_classify(roi_feats_cls.reshape(b * n, 7, 7, -1), stage)
    c = cls_score.shape[-1]
    cls_score = cls_score.reshape(b, g, u1, u2, c)
    ins_score = ins_score.reshape(b, g, u1, u2, c)

    cls_sig = jax.nn.sigmoid(cls_score)
    ins_soft = jax.nn.softmax(ins_score, axis=3) * ext_valid[..., None]
    ins_norm = ins_soft / jnp.maximum(jnp.abs(ins_soft).sum(3, keepdims=True), 1e-12)
    bag_score = (cls_sig * ins_norm).sum(3)
    onehot = jnp.broadcast_to(
        jax.nn.one_hot(labels, c, dtype=bag_score.dtype)[:, :, None, :], bag_score.shape
    )
    bag_w = (ext_valid.sum(3) > 0) & boxes_valid[:, :, None]
    num_sample = jnp.maximum(bag_w.sum().astype(bag_score.dtype), 1.0)
    loss_mil_bags = gfocal_loss(
        bag_score, onehot, bag_w[..., None].astype(bag_score.dtype)
    ).sum() / num_sample

    if use_neg:
        neg_sig = jax.nn.sigmoid(neg_cls.reshape(b, nn_, c))
        loss_mil_bags = loss_mil_bags + gfocal_loss(
            neg_sig, jnp.zeros_like(neg_sig), neg_w[..., None].astype(neg_sig.dtype)
        ).sum() / num_sample

    safe_labels = jnp.clip(labels, 0, c - 1)
    sel_cls = jnp.take_along_axis(
        cls_sig.reshape(b, g, u1 * u2, c), safe_labels[:, :, None, None], axis=-1
    )[..., 0]
    sel_ins = jnp.take_along_axis(
        ins_norm.reshape(b, g, u1 * u2, c), safe_labels[:, :, None, None], axis=-1
    )[..., 0]
    sel = jax.lax.stop_gradient(sel_cls * sel_ins)
    top_scores, top_idx = jax.lax.top_k(sel, top_k)
    top_boxes = jnp.take_along_axis(
        refined_rb.reshape(b, g, u1 * u2, 5), top_idx[..., None], axis=2
    )
    wsel = top_scores / (top_scores.sum(-1, keepdims=True) + 1e-8)
    merged = (top_boxes * wsel[..., None]).sum(2)
    h, w = hw
    # reference quirk (mil_bag_selection_single OBB :1211-1212): only the
    # centre is clamped, first to [0, w] then [0, h]
    merged = merged.at[..., 0:2].set(
        jnp.clip(jnp.clip(merged[..., 0:2], 0, w), 0, h)
    )
    refined = (1 - beta) * merged + beta * rboxes
    refined = jnp.where(boxes_valid[..., None], refined, rboxes)

    return MILStageOut(refined, loss_mil_bbox, loss_mil_bags, coarse_bags_iou,
                       refine_bags_iou, cls_pool_coverage)


class _BagsPrep(NamedTuple):
    """Pooled reg bags + the context the tower/tail needs (one branch)."""
    props: Array
    props_valid: Array
    ext: Array          # [B, G, U1, U2, 4]
    ext_valid: Array    # [B, G, U1, U2]
    ext_real: Array
    roi_feats: Array    # [B, N, 7, 7, C], N = G*U1*U2
    win: Optional[Array]
    wy0: Optional[Array]
    wx0: Optional[Array]
    ctrs: Array
    gchunk: int
    coarse_bags_iou: Array


def _bags_prep(mil_feat, boxes, boxes_valid, real_boxes, fine_cfg, ext_cfg,
               hw, window, grouped, roi_chunk):
    """Proposal bags + the reg-bag pool for one branch (shared by mil_stage
    and the fused two-branch phase-1 entry)."""
    b, g = boxes.shape[:2]

    # U1 base bags around each box
    props, props_valid = jax.vmap(lambda bx: fine_proposals(bx, fine_cfg, hw))(boxes)
    u1 = props.shape[2]
    # U2 extensive bags around each base bag
    ext, ext_valid = jax.vmap(
        lambda bx: fine_proposals(bx.reshape(-1, 4), ext_cfg, hw)
    )(props)
    u2 = ext.shape[2]
    ext = ext.reshape(b, g, u1, u2, 4)
    ext_valid = ext_valid.reshape(b, g, u1, u2) & boxes_valid[:, :, None, None]
    ext_real = jnp.broadcast_to(real_boxes[:, :, None, None, :], ext.shape)

    coarse_bags_iou = _masked_mean(
        bbox_overlaps(ext, ext_real, is_aligned=True),
        jnp.broadcast_to(boxes_valid[:, :, None, None], ext.shape[:-1]),
    )

    # single-shot when the [G, U, out, window, C] intermediate fits (~2.3 GB
    # bf16 across the batch at the shipped U=25): the lax.map chunk loop was
    # the serializer, not the gathers (NOTES_r3 pool bisect). U=125 (noisy
    # stage-2) falls back to 20-group chunks.
    gchunk = min(g, max(8, 2560 // (u1 * u2)))
    feat_hw = (mil_feat.shape[1], mil_feat.shape[2])
    ctrs = xyxy_to_cxcywh(boxes)[..., :2]  # [B, G, 2] group window origins
    if grouped:
        # grouped shared-window pool: the bags of one GT are co-located by
        # construction (fine_proposals ratio-scales w/h and shake-shifts by
        # <=0.1 box size), so one window gather serves all U members —
        # AND both pools of the stage: the reg bags (jittered inputs) and
        # the cls bags (their DN-refined positions, pulled toward the same
        # reference box by the denoising loss) share the GT-centred window,
        # halving the dynamic-slice gather/scatter traffic that dominates
        # the grouped pool (r5; window extraction factored out).
        # The window size (cfg.mil_pool_window) sets the exactness range —
        # see train/config.py. `grouped=False` (cfg.mil_pool_grouped)
        # selects the exact per-roi path instead — the fallback when a
        # dataset breaks the window assumption (cls_pool_coverage < 1).
        from ..ops.roi_align import (
            extract_group_windows, roi_align_grouped_from_windows)

        win, wy0, wx0 = jax.vmap(
            lambda f, c_: extract_group_windows(f, c_, window=window)
        )(mil_feat, ctrs)

        def gpool_win(w_, y0, x0, rois):
            return roi_align_grouped_from_windows(
                w_, y0, x0, rois, feat_hw, out_size=7,
                spatial_scale=1.0 / 8, chunk=gchunk)

        roi_feats = jax.vmap(gpool_win)(
            win, wy0, wx0, ext.reshape(b, g, u1 * u2, 4)
        ).reshape(b, g * u1 * u2, 7, 7, -1)
    else:
        win = wy0 = wx0 = None

        def pool(feat, rois):
            return roi_align(feat, rois, out_size=7, spatial_scale=1.0 / 8,
                             chunk=roi_chunk)

        roi_feats = jax.vmap(
            lambda f, rr: pool(f, rr.reshape(-1, 4)).reshape(
                g, u1 * u2, 7, 7, -1)
        )(mil_feat, ext.reshape(b, g, u1 * u2, 4)).reshape(
            b, g * u1 * u2, 7, 7, -1)
    return _BagsPrep(props, props_valid, ext, ext_valid, ext_real, roi_feats,
                     win, wy0, wx0, ctrs, gchunk, coarse_bags_iou)


def _reg_finish(prep: _BagsPrep, deltas, boxes, boxes_valid, hw, dn_hyper):
    """Decode tower deltas + DN denoising loss for one branch's reg bags."""
    b, g, u1, u2 = prep.ext_valid.shape
    ext_ref = jnp.broadcast_to(boxes[:, :, None, None, :], prep.ext.shape)
    pred = delta_decode(prep.ext.reshape(-1, 4), deltas, hw).reshape(b, g, u1, u2, 4)
    w_valid = prep.ext_valid.astype(pred.dtype)
    avg = jnp.maximum((boxes_valid.sum() * u1 * u2).astype(pred.dtype), 1.0)
    # base_valid: see mil_stage_rotated — reference DN base averages over
    # every real-GT bag row, not just the weight-valid ones
    loss_mil_bbox = dn_diou_loss(
        pred.reshape(-1, 4), ext_ref.reshape(-1, 4), weight=w_valid.reshape(-1),
        avg_factor=avg, hyper=dn_hyper,
        base_valid=jnp.broadcast_to(boxes_valid[:, :, None, None],
                                    prep.ext.shape[:-1]).reshape(-1),
    )
    pred_d = jax.lax.stop_gradient(pred)
    refine_bags_iou = _masked_mean(
        bbox_overlaps(pred_d, prep.ext_real, is_aligned=True),
        jnp.broadcast_to(boxes_valid[:, :, None, None], prep.ext.shape[:-1]),
    )
    return loss_mil_bbox, pred_d, refine_bags_iou


def mil_stage(
    mil_regress: Callable[[Array, int], Array],
    mil_classify: Callable[[Array, int], tuple],
    mil_classify_neg: Optional[Callable[[Array, int], Array]],
    mil_feat: Array,
    boxes: Array,
    labels: Array,
    boxes_valid: Array,
    real_boxes: Array,
    fine_cfg: FineProposalCfg,
    ext_cfg: FineProposalCfg,
    stage: int,
    img_hw,
    top_k: int,
    beta: float,
    dn_hyper: float,
    neg_key: Optional[Array],
    with_bags_loss: bool,
    roi_chunk: int = 256,  # covers gen_num_neg=200 single-shot (no lax.map)
    window: int = 32,
    grouped: bool = True,
):
    """One MIL refinement stage over a batch.

    mil_feat [B,Hf,Wf,C]; boxes (pseudo or synthetic) [B,G,4] xyxy;
    labels [B,G]; boxes_valid [B,G]; real_boxes [B,G,4] (diagnostics only).
    Returns MILStageOut. `with_bags_loss=False` computes only the denoising
    regression loss (the synthetic branch of MIL_head_burn_in_step1 uses only
    loss_mil_bbox; its classifier output is discarded, so we skip it).
    """
    b, g = boxes.shape[:2]
    hw = img_hw

    prep = _bags_prep(mil_feat, boxes, boxes_valid, real_boxes, fine_cfg,
                      ext_cfg, hw, window, grouped, roi_chunk)
    ext, ext_valid = prep.ext, prep.ext_valid
    u1, u2 = ext_valid.shape[2], ext_valid.shape[3]
    ext_real = prep.ext_real
    props, props_valid = prep.props, prep.props_valid
    coarse_bags_iou = prep.coarse_bags_iou
    n = prep.roi_feats.shape[1]

    deltas = mil_regress(prep.roi_feats.reshape(b * n, 7, 7, -1), stage)
    loss_mil_bbox, pred_d, refine_bags_iou = _reg_finish(
        prep, deltas, boxes, boxes_valid, hw, dn_hyper)

    if not with_bags_loss:
        return MILStageOut(boxes, loss_mil_bbox, jnp.zeros(()), coarse_bags_iou,
                           refine_bags_iou)
    return _bags_tail(mil_classify, mil_classify_neg, mil_feat, prep, pred_d,
                      loss_mil_bbox, refine_bags_iou, labels, boxes,
                      boxes_valid, fine_cfg, stage, hw, top_k, beta, neg_key,
                      roi_chunk, window, grouped)


def _bags_tail(mil_classify, mil_classify_neg, mil_feat, prep: _BagsPrep,
               pred_d, loss_mil_bbox, refine_bags_iou, labels, boxes,
               boxes_valid, fine_cfg, stage, hw, top_k, beta, neg_key,
               roi_chunk, window, grouped):
    """Bag classification + negative bags + top-k selection (the
    with_bags_loss tail of mil_stage, shared with the fused phase-1 entry).
    pred_d [B, G, U1, U2, 4] are the stop-gradient DN-refined bag boxes."""
    b, g, u1, u2 = prep.ext_valid.shape
    n = prep.roi_feats.shape[1]
    ext_valid = prep.ext_valid
    coarse_bags_iou = prep.coarse_bags_iou
    props, props_valid = prep.props, prep.props_valid
    ctrs = prep.ctrs
    win, wy0, wx0 = prep.win, prep.wy0, prep.wx0
    feat_hw = (mil_feat.shape[1], mil_feat.shape[2])

    def pool(feat, rois):
        # per-roi fallback (negatives: scattered across the image, ungrouped)
        return roi_align(feat, rois, out_size=7, spatial_scale=1.0 / 8, chunk=roi_chunk)

    def gpool_win(w_, y0, x0, rois):
        from ..ops.roi_align import roi_align_grouped_from_windows

        return roi_align_grouped_from_windows(
            w_, y0, x0, rois, feat_hw,
            out_size=7, spatial_scale=1.0 / 8, chunk=prep.gchunk)

    # --- bag classification on the refined bags ---
    # refined bags stay grouped (DN-denoising pulls every member toward its
    # reference box), so they are pooled from the SAME per-GT windows the reg
    # bags used (one gather serves both pools); the coverage diagnostic
    # measures fit against those actual window origins
    if grouped:
        cls_pool_coverage = _group_window_coverage(
            pred_d.reshape(b, g, u1 * u2, 4), ext_valid.reshape(b, g, u1 * u2),
            ctrs, feat_hw, window=window)
        roi_feats_cls = jax.vmap(gpool_win)(
            win, wy0, wx0, pred_d.reshape(b, g, u1 * u2, 4)
        ).reshape(b, n, 7, 7, -1)
    else:
        cls_pool_coverage = jnp.ones(())
        roi_feats_cls = jax.vmap(
            lambda f, rr: pool(f, rr.reshape(-1, 4)).reshape(
                g, u1 * u2, 7, 7, -1)
        )(mil_feat, pred_d.reshape(b, g, u1 * u2, 4)).reshape(b, n, 7, 7, -1)
    # negatives share the bag tower AND fc_cls with the positive bags
    # (mil_bag_classifier / classify_neg use the same weights,
    # fcos_head_p2b_ts.py:1240-1256): fold their rows into the SAME tower
    # call — one [B*(n+neg), 12544] matmul launch instead of two (r5; the
    # per-row math is identical, fc_ins on the neg rows is discarded).
    use_neg = (mil_classify_neg is not None and neg_key is not None
               and fine_cfg.gen_num_neg > 0)
    if use_neg:
        nn_ = fine_cfg.gen_num_neg
        keys = jax.random.split(neg_key, b)
        neg, neg_w = jax.vmap(
            lambda k, p, v: negative_proposals(k, p, v, nn_, hw)
        )(keys, props, props_valid & boxes_valid[:, :, None])
        neg_feats = jax.vmap(pool)(mil_feat, neg)
        all_feats = jnp.concatenate(
            [roi_feats_cls.reshape(b * n, 7, 7, roi_feats_cls.shape[-1]),
             neg_feats.reshape(b * nn_, 7, 7, neg_feats.shape[-1])], axis=0)
        cls_all, ins_all = mil_classify(all_feats, stage)
        cls_score, ins_score = cls_all[:b * n], ins_all[:b * n]
        neg_cls = cls_all[b * n:]
    else:
        cls_score, ins_score = mil_classify(roi_feats_cls.reshape(b * n, 7, 7, -1), stage)
    c = cls_score.shape[-1]
    cls_score = cls_score.reshape(b, g, u1, u2, c)
    ins_score = ins_score.reshape(b, g, u1, u2, c)

    cls_sig = jax.nn.sigmoid(cls_score)
    ins_soft = jax.nn.softmax(ins_score, axis=3)
    ins_soft = ins_soft * ext_valid[..., None]
    ins_norm = ins_soft / jnp.maximum(jnp.abs(ins_soft).sum(3, keepdims=True), 1e-12)

    bag_score = (cls_sig * ins_norm).sum(3)  # [B, G, U1, C]
    onehot = jax.nn.one_hot(labels, c, dtype=bag_score.dtype)
    onehot = jnp.broadcast_to(onehot[:, :, None, :], bag_score.shape)
    bag_w = (ext_valid.sum(3) > 0) & boxes_valid[:, :, None]  # [B, G, U1]
    num_sample = jnp.maximum(bag_w.sum().astype(bag_score.dtype), 1.0)
    loss_pos = gfocal_loss(bag_score, onehot, bag_w[..., None].astype(bag_score.dtype))
    loss_mil_bags = loss_pos.sum() / num_sample

    if use_neg:
        neg_sig = jax.nn.sigmoid(neg_cls.reshape(b, nn_, c))
        loss_neg = gfocal_loss(neg_sig, jnp.zeros_like(neg_sig),
                               neg_w[..., None].astype(neg_sig.dtype))
        loss_mil_bags = loss_mil_bags + loss_neg.sum() / num_sample

    # --- selection: top-k weighted merge, beta blend ---
    safe_labels = jnp.clip(labels, 0, c - 1)
    sel_cls = jnp.take_along_axis(
        cls_sig.reshape(b, g, u1 * u2, c), safe_labels[:, :, None, None], axis=-1
    )[..., 0]
    sel_ins = jnp.take_along_axis(
        ins_norm.reshape(b, g, u1 * u2, c), safe_labels[:, :, None, None], axis=-1
    )[..., 0]
    sel = jax.lax.stop_gradient(sel_cls * sel_ins)  # [B, G, U1*U2]
    top_scores, top_idx = jax.lax.top_k(sel, top_k)
    top_boxes = jnp.take_along_axis(
        pred_d.reshape(b, g, u1 * u2, 4), top_idx[..., None], axis=2
    )
    wsel = top_scores / (top_scores.sum(-1, keepdims=True) + 1e-8)
    merged = (top_boxes * wsel[..., None]).sum(2)
    h, w = hw
    merged = merged.at[..., 0::2].set(jnp.clip(merged[..., 0::2], 0, w))
    merged = merged.at[..., 1::2].set(jnp.clip(merged[..., 1::2], 0, h))
    refined = (1 - beta) * merged + beta * boxes
    refined = jnp.where(boxes_valid[..., None], refined, boxes)

    return MILStageOut(refined, loss_mil_bbox, loss_mil_bags, coarse_bags_iou,
                       refine_bags_iou, cls_pool_coverage)


def mil_stage_pair_phase1(
    mil_regress,
    mil_classify,
    mil_classify_neg,
    feat_syn: Array,
    syn_boxes: Array,
    syn_valid: Array,
    feat_ori: Array,
    boxes: Array,
    labels: Array,
    boxes_valid: Array,
    real_boxes: Array,
    fine_cfg: FineProposalCfg,
    ext_cfg: FineProposalCfg,
    stage: int,
    img_hw,
    top_k: int,
    beta: float,
    dn_hyper: float,
    neg_key: Optional[Array],
    roi_chunk: int = 256,
    window: int = 32,
    grouped: bool = True,
):
    """Fused phase-1 MIL: the synthetic branch (denoising reg only,
    MIL_head_burn_in_step1's syn bags whose classifier output is discarded)
    and the real branch share the SAME reg_tower weights, so both branches'
    bag rows run through ONE [2*B*N, 12544] tower matmul instead of two
    launches (r5). Per-row math is identical to
    mil_stage(syn, with_bags=False) + mil_stage(ori, with_bags=True) —
    pinned by tests/test_train_step.py::test_fused_pair_equals_two_stages.

    Returns (syn MILStageOut, ori MILStageOut).
    """
    b = boxes.shape[0]
    hw = img_hw
    prep_s = _bags_prep(feat_syn, syn_boxes, syn_valid, syn_boxes, fine_cfg,
                        ext_cfg, hw, window, grouped, roi_chunk)
    prep_o = _bags_prep(feat_ori, boxes, boxes_valid, real_boxes, fine_cfg,
                        ext_cfg, hw, window, grouped, roi_chunk)
    ns = prep_s.roi_feats.shape[1]
    no = prep_o.roi_feats.shape[1]
    c = prep_s.roi_feats.shape[-1]
    rows = jnp.concatenate(
        [prep_s.roi_feats.reshape(b * ns, 7, 7, c),
         prep_o.roi_feats.reshape(b * no, 7, 7, c)], axis=0)
    deltas = mil_regress(rows, stage)
    loss_s, _, refine_iou_s = _reg_finish(
        prep_s, deltas[:b * ns], syn_boxes, syn_valid, hw, dn_hyper)
    loss_o, pred_d_o, refine_iou_o = _reg_finish(
        prep_o, deltas[b * ns:], boxes, boxes_valid, hw, dn_hyper)
    syn_out = MILStageOut(syn_boxes, loss_s, jnp.zeros(()),
                          prep_s.coarse_bags_iou, refine_iou_s)
    ori_out = _bags_tail(mil_classify, mil_classify_neg, feat_ori, prep_o,
                         pred_d_o, loss_o, refine_iou_o, labels, boxes,
                         boxes_valid, fine_cfg, stage, hw, top_k, beta,
                         neg_key, roi_chunk, window, grouped)
    return syn_out, ori_out
