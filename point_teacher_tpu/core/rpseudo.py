"""Teacher pseudo-box generation for rotated boxes.

Capability target: rotated_fcos_head_p2rb_ts.py:871-935 (_gnerate_pseudo_single):
decode (l,t,r,b,theta) via DistanceAnglePointCoder, FUSETopk assignment
(insider cost on the (cx,cy,w,h) part), score-weighted average of all 5 dims
(naive angle averaging, as in the reference), default pseudo box
(point, 8, 8, 0).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.rotated import distance_angle_decode, rbox_iou
from .assigners import topk_assign
from .costs import focal_cost, insider_cost, point_cost
from .pseudo import FuseAssignerCfg

Array = jnp.ndarray


def generate_pseudo_rboxes(
    points: Array,
    cls_logits: Array,
    bbox_angle_pred: Array,  # [P, 5] (l, t, r, b, theta)
    gt_points: Array,
    gt_labels: Array,
    gt_valid: Array,
    gt_rboxes: Array,        # [G, 5] (diagnostics)
    filter_score: float,
    cfg: FuseAssignerCfg,
):
    num_points = points.shape[0]
    g = gt_points.shape[0]

    decoded = distance_angle_decode(points, bbox_angle_pred)  # [P, 5] cxcywh+a

    reg = point_cost(points, gt_points, weight=cfg.reg_weight, mode=cfg.reg_mode)
    stage2 = focal_cost(cls_logits, gt_labels, weight=cfg.cls_weight) + insider_cost(
        decoded[:, :4], gt_points, weight=cfg.insider_weight
    )
    assigned = topk_assign(reg, stage2, gt_valid, cfg.num_pre, cfg.topk)

    pos = assigned >= 0
    safe_gt = jnp.clip(assigned, 0, g - 1)
    lab = jnp.where(pos, gt_labels[safe_gt], 0)
    scores = jax.nn.sigmoid(cls_logits)[jnp.arange(num_points), lab]

    onehot = jax.nn.one_hot(safe_gt, g, dtype=decoded.dtype) * pos[:, None]
    w = scores * pos
    box_sum = (onehot * w[:, None]).T @ decoded  # [G, 5]
    w_sum = onehot.T @ w
    n_assigned = onehot.sum(0)

    matched = n_assigned > 0
    default_box = jnp.concatenate(
        [gt_points, jnp.full((g, 2), 8.0, decoded.dtype), jnp.zeros((g, 1), decoded.dtype)],
        axis=-1,
    )
    pseudo = jnp.where(matched[:, None], box_sum / jnp.maximum(w_sum, 1e-12)[:, None],
                       default_box)
    pseudo_scores = jnp.where(matched, w_sum / jnp.maximum(n_assigned, 1.0), 0.0)
    pseudo_points = jnp.where(matched[:, None], pseudo[:, :2], gt_points)

    ious = rbox_iou(pseudo, gt_rboxes, aligned=True)
    denom = jnp.maximum((matched & gt_valid).sum(), 1)
    mean_iou = jnp.where(matched & gt_valid, ious, 0.0).sum() / denom

    pseudo_valid = matched & (pseudo_scores >= filter_score) & gt_valid
    return dict(
        pseudo_boxes=pseudo,
        pseudo_points=pseudo_points,
        pseudo_labels=gt_labels,
        pseudo_valid=pseudo_valid,
        matched=matched & gt_valid,
        mean_iou=mean_iou,
    )
