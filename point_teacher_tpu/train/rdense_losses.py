"""Rotated dense-head losses.

Capability targets in rotated_fcos_head_p2rb_ts.py:
- `loss` (:533-627): synthetic branch — RotatedIoULoss (loss_bbox_burn1) on
  DistanceAnglePointCoder-decoded boxes, centerness BCE.
- `loss_pseudo` (:418-530): focal cls + loss_bbox (= loss_bbox_burn1
  RotatedIoULoss — NOT loss_bbox_burn2; the separate-angle path is commented
  out in the reference, SURVEY.md §2.1 #14 nuance) + centerness BCE.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.rtargets import pseudo_targets_rotated, syn_targets_rotated
from ..core.targets import AssignerCfg
from ..ops.losses import (
    binary_cross_entropy,
    centerness_target,
    focal_loss_from_labels,
    rotated_iou_loss,
)
from ..ops.rotated import distance_angle_decode

Array = jnp.ndarray


class RDenseLossCfg(NamedTuple):
    num_classes: int = 9
    syn_assigner: AssignerCfg = AssignerCfg(num_pre=3, topk=3, cls_weight=0.0, reg_weight=1.0)
    cls_assigner: AssignerCfg = AssignerCfg(num_pre=1, topk=1, cls_weight=1.0, reg_weight=1.0)
    pseudo_assigner: AssignerCfg = AssignerCfg(num_pre=3, topk=3, cls_weight=0.0, reg_weight=1.0)
    iou_mode: str = "log"
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0


def _rotated_reg_loss(bbox_pred, angle_pred, centerness, points, labels, ltrb_t,
                      angle_t, num_classes, iou_mode, max_pos=None):
    b, p = labels.shape
    pos = labels < num_classes
    num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)
    ctr_t = jnp.where(pos, centerness_target(ltrb_t), 0.0)
    denorm = jnp.maximum(jax.lax.stop_gradient(ctr_t.sum()), 1e-6)

    pred5 = jnp.concatenate([bbox_pred, angle_pred], -1)
    tgt5 = jnp.concatenate([ltrb_t, angle_t], -1)
    if max_pos is not None and max_pos < p:
        # The polygon-clip IoU (fwd + bwd) is ~100x the op count of an HBB
        # IoU; running it over all P grid points when positives are bounded
        # by num_pre*G is the rotated step's dominant cost. The top-k assigner
        # yields at most num_pre candidates per GT column, so gathering the
        # max_pos largest-weight rows per image is EXACT: every excluded row
        # has ctr_t == 0 and contributes nothing to the weighted sum.
        w_top, idx = jax.lax.top_k(ctr_t, max_pos)          # [B, K]
        pts = points[idx]                                   # [B, K, 2]
        take = lambda x: jnp.take_along_axis(x, idx[..., None], axis=1)
        pred5, tgt5, weights = take(pred5), take(tgt5), w_top
    else:
        pts = jnp.broadcast_to(points[None], (b, p, 2))
        weights = ctr_t
    dec_pred = distance_angle_decode(pts, pred5)
    dec_tgt = distance_angle_decode(pts, tgt5)
    loss_bbox = rotated_iou_loss(
        dec_pred.reshape(-1, 5), dec_tgt.reshape(-1, 5),
        weight=weights.reshape(-1), avg_factor=denorm, mode=iou_mode,
    )
    loss_ctr = binary_cross_entropy(
        centerness.reshape(-1), ctr_t.reshape(-1),
        weight=pos.reshape(-1).astype(jnp.float32), avg_factor=num_pos,
    )
    return loss_bbox, loss_ctr


def syn_branch_loss_rotated(
    cls_logits: Array,   # [B, P, C]
    bbox_pred: Array,    # [B, P, 4]
    angle_pred: Array,   # [B, P, 1]
    centerness: Array,   # [B, P]
    points: Array,
    syn_rboxes: Array,   # [B, S, 5]
    syn_valid: Array,
    cfg: RDenseLossCfg,
):
    labels, ltrb_t, angle_t = jax.vmap(
        lambda cl, gb, gv: syn_targets_rotated(points, cl, gb, gv, cfg.num_classes,
                                               cfg.syn_assigner)
    )(cls_logits, syn_rboxes, syn_valid)
    return _rotated_reg_loss(bbox_pred, angle_pred, centerness, points, labels,
                             ltrb_t, angle_t, cfg.num_classes, cfg.iou_mode,
                             max_pos=cfg.syn_assigner.num_pre * syn_rboxes.shape[1])


def pseudo_branch_loss_rotated(
    cls_logits: Array,
    bbox_pred: Array,
    angle_pred: Array,
    centerness: Array,
    points: Array,
    gt_points: Array,
    gt_labels: Array,
    gt_valid: Array,
    pseudo_rboxes: Array,
    pseudo_valid: Array,
    cfg: RDenseLossCfg,
):
    labels, labels_reg, ltrb_t, angle_t = jax.vmap(
        lambda cl, gp, gl, gv, pb, pv: pseudo_targets_rotated(
            points, cl, gp, gl, gv, pb, pv, cfg.num_classes,
            cfg.cls_assigner, cfg.pseudo_assigner,
        )
    )(cls_logits, gt_points, gt_labels, gt_valid, pseudo_rboxes, pseudo_valid)

    pos_cls = labels < cfg.num_classes
    num_pos_cls = jnp.maximum(pos_cls.sum().astype(jnp.float32), 1.0)
    loss_cls = focal_loss_from_labels(
        cls_logits.reshape(-1, cfg.num_classes), labels.reshape(-1),
        cfg.num_classes, avg_factor=num_pos_cls,
        alpha=cfg.focal_alpha, gamma=cfg.focal_gamma,
    )
    loss_bbox, loss_ctr = _rotated_reg_loss(
        bbox_pred, angle_pred, centerness, points, labels_reg, ltrb_t, angle_t,
        cfg.num_classes, cfg.iou_mode,
        max_pos=cfg.pseudo_assigner.num_pre * pseudo_rboxes.shape[1],
    )
    return loss_cls, loss_bbox, loss_ctr
