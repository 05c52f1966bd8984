"""Teacher pseudo-box generation: score-weighted averaging of teacher
predictions matched to each annotation point.

Parity target: fcos_head_p2b_ts.py:736-794 (_gnerate_pseudo_single) with the
FUSETopkAssigner (fuse_topk_assigner.py). The one-hot matmul accumulation of
the reference is already matmul-shaped; here it is a masked segment-sum.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.boxes import cxcywh_to_xyxy, distance2bbox, xyxy_to_cxcywh, bbox_overlaps
from .assigners import topk_assign
from .costs import focal_cost, insider_cost, point_cost

Array = jnp.ndarray


class FuseAssignerCfg(NamedTuple):
    num_pre: int = 5
    topk: int = 3
    cls_weight: float = 1.0
    reg_weight: float = 1.0
    insider_weight: float = 1.0
    reg_mode: str = "L1"


def generate_pseudo_boxes(
    points: Array,
    cls_logits: Array,
    bbox_pred: Array,
    gt_points: Array,
    gt_labels: Array,
    gt_valid: Array,
    gt_boxes_xyxy: Array,
    filter_score: float,
    cfg: FuseAssignerCfg,
):
    """One image. points [P,2]; cls_logits [P,C]; bbox_pred [P,4] (l,t,r,b in px);
    gt_points [G,2]; gt_labels [G]; gt_valid [G]; gt_boxes_xyxy [G,4] (diagnostics).

    Returns dict with pseudo_boxes [G,4] xyxy, pseudo_points [G,2],
    pseudo_valid [G] (matched & score filter), mean_iou (diagnostic scalar).
    """
    num_points = points.shape[0]
    g = gt_points.shape[0]

    decoded = distance2bbox(points, bbox_pred)  # [P,4] xyxy
    decoded_cxcywh = xyxy_to_cxcywh(decoded)

    reg = point_cost(points, gt_points, weight=cfg.reg_weight, mode=cfg.reg_mode)
    stage2 = focal_cost(cls_logits, gt_labels, weight=cfg.cls_weight) + insider_cost(
        decoded_cxcywh, gt_points, weight=cfg.insider_weight
    )
    assigned = topk_assign(reg, stage2, gt_valid, cfg.num_pre, cfg.topk)  # [P]

    pos = assigned >= 0
    # per-point score at its assigned gt's label (reference: labels default 0)
    safe_gt = jnp.clip(assigned, 0, g - 1)
    lab = jnp.where(pos, gt_labels[safe_gt], 0)
    scores = jax.nn.sigmoid(cls_logits)[jnp.arange(num_points), lab]  # [P]

    onehot = jax.nn.one_hot(safe_gt, g, dtype=decoded.dtype) * pos[:, None]  # [P,G]
    w = scores * pos  # [P]
    box_sum = (onehot * w[:, None]).T @ decoded  # [G,4]
    w_sum = onehot.T @ w  # [G]
    n_assigned = onehot.sum(0)  # [G]

    matched = n_assigned > 0
    # default pseudo box: 8x8 box centred on the annotation point
    default_box = cxcywh_to_xyxy(
        jnp.concatenate([gt_points, jnp.full_like(gt_points, 8.0)], axis=-1)
    )
    pseudo_boxes = jnp.where(
        matched[:, None], box_sum / jnp.maximum(w_sum, 1e-12)[:, None], default_box
    )
    pseudo_scores = jnp.where(matched, w_sum / jnp.maximum(n_assigned, 1.0), 0.0)
    pseudo_points = jnp.where(
        matched[:, None], xyxy_to_cxcywh(pseudo_boxes)[:, :2], gt_points
    )

    ious = bbox_overlaps(pseudo_boxes, gt_boxes_xyxy, is_aligned=True)
    denom = jnp.maximum((matched & gt_valid).sum(), 1)
    mean_iou = jnp.where(matched & gt_valid, ious, 0.0).sum() / denom

    pseudo_valid = matched & (pseudo_scores >= filter_score) & gt_valid
    return dict(
        pseudo_boxes=pseudo_boxes,
        pseudo_points=pseudo_points,
        pseudo_labels=gt_labels,
        pseudo_valid=pseudo_valid,
        matched=matched & gt_valid,
        mean_iou=mean_iou,
    )
