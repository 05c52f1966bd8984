"""Match costs, vectorised over padded GT sets.

Parity targets: HBB_TOD/mmdet/core/bbox/match_costs/match_cost.py
(FocalLossCost :54, PointCost :188, InsiderCost :216, CenternessCost :254,
CrossEntropyLossCost :341). All return [P, G] cost matrices; invalid GT
columns are the caller's responsibility (they mask with gt_valid).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def focal_cost(cls_logits: Array, gt_labels: Array, weight: float = 1.0,
               alpha: float = 0.25, gamma: float = 2.0, eps: float = 1e-12) -> Array:
    """cls_logits [P, C], gt_labels [G] -> [P, G]."""
    p = jax.nn.sigmoid(cls_logits)
    neg = -jnp.log(1 - p + eps) * (1 - alpha) * jnp.power(p, gamma)
    pos = -jnp.log(p + eps) * alpha * jnp.power(1 - p, gamma)
    cost = pos - neg  # [P, C]
    safe = jnp.clip(gt_labels, 0, cls_logits.shape[-1] - 1)
    return cost[:, safe] * weight


def point_cost(points: Array, gt_cxcywh: Array, weight: float = 1.0, mode: str = "L1") -> Array:
    """points [P, >=2] (uses first 2 dims), gt [G, >=2] -> [P, G]."""
    d = points[:, None, :2] - gt_cxcywh[None, :, :2]
    if mode == "L1":
        dist = jnp.abs(d).sum(-1)
    else:
        dist = jnp.sqrt((d * d).sum(-1))
    return dist * weight


def classification_cost(cls_logits: Array, gt_labels: Array, weight: float = 1.0) -> Array:
    """ClassificationCost (match_cost.py:103): -softmax(cls)[:, labels]."""
    score = jax.nn.softmax(cls_logits, axis=-1)
    safe = jnp.clip(gt_labels, 0, cls_logits.shape[-1] - 1)
    return -score[:, safe] * weight


def bbox_l1_cost(pred_xyxy: Array, gt_xyxy: Array, weight: float = 1.0) -> Array:
    """BBoxL1Cost: pairwise L1 over box coordinates. [P, G]."""
    return jnp.abs(pred_xyxy[:, None, :] - gt_xyxy[None, :, :]).sum(-1) * weight


def iou_cost(pred_xyxy: Array, gt_xyxy: Array, weight: float = 1.0,
             mode: str = "giou") -> Array:
    """IoUCost (match_cost.py:147): -overlaps."""
    from ..ops.boxes import bbox_overlaps

    return -bbox_overlaps(pred_xyxy, gt_xyxy, mode=mode) * weight


def sam_point_cost(a: Array, b: Array, weight: float = 1.0, mode: str = "L1") -> Array:
    """SAMPointCost (match_cost.py:283): pairwise distance over FULL vectors."""
    d = a[:, None, :] - b[None, :, :]
    dist = jnp.abs(d).sum(-1) if mode == "L1" else jnp.sqrt((d * d).sum(-1))
    return dist * weight


def h_point_cost(boxes1_xyxy: Array, boxes2_xyxy: Array, weight: float = 1.0,
                 mode: str = "L1") -> Array:
    """HPointCost (match_cost.py:313): centre distance of xyxy boxes."""
    c1 = (boxes1_xyxy[:, :2] + boxes1_xyxy[:, 2:4]) / 2
    c2 = (boxes2_xyxy[:, :2] + boxes2_xyxy[:, 2:4]) / 2
    return point_cost(c1, c2, weight=weight, mode=mode)


def centerness_cost(centerness: Array, gt_centerness: Array, weight: float = 1.0,
                    mode: str = "L1") -> Array:
    """CenternessCost (match_cost.py:254): pairwise |c_i - g_j|. [P, G]."""
    d = centerness.reshape(-1, 1)[:, None] - gt_centerness.reshape(-1, 1)[None]
    dist = jnp.abs(d).sum(-1) if mode == "L1" else jnp.sqrt((d * d).sum(-1))
    return dist * weight


def cross_entropy_cost(cls_logits: Array, gt_onehot: Array, weight: float = 1.0) -> Array:
    """CrossEntropyLossCost (match_cost.py:341, use_sigmoid): pairwise BCE
    between per-query sigmoid logits and per-gt binary targets. [P, G]."""
    x = cls_logits.reshape(cls_logits.shape[0], -1)
    t = gt_onehot.reshape(gt_onehot.shape[0], -1).astype(x.dtype)
    n = x.shape[1]
    pos = jnp.clip(x, 0, None) - x + jnp.log1p(jnp.exp(-jnp.abs(x)))  # BCE vs 1
    neg = jnp.clip(x, 0, None) + jnp.log1p(jnp.exp(-jnp.abs(x)))      # BCE vs 0
    cost = pos @ t.T + neg @ (1 - t).T
    return cost / n * weight


def sigmoid_ce_cost(cls_logits: Array, gt_labels: Array, weight: float = 1.0) -> Array:
    """SigmoidCECost (Supplement_config/bbox/match_costs/match_cost.py:196):
    -sigmoid(cls)[:, labels] — the DETR-style 1 - p approximation with the
    constant dropped. [P, G]."""
    score = jax.nn.sigmoid(cls_logits)
    safe = jnp.clip(gt_labels, 0, cls_logits.shape[-1] - 1)
    return -score[:, safe] * weight


def riou_cost(pred_rb: Array, gt_rb: Array, weight: float = 1.0) -> Array:
    """RIoUCost (Supplement_config/bbox/match_costs/match_cost.py:263):
    -rotated_overlaps(pred, gt). Boxes are (cx, cy, w, h, a); a trailing
    score column (6-dim) is dropped as in RRBboxOverlaps2D. [P, G]."""
    from ..ops.rotated import rbox_iou

    p = pred_rb[:, :5]
    g = gt_rb[:, :5]
    pm = jnp.broadcast_to(p[:, None, :], (p.shape[0], g.shape[0], 5)).reshape(-1, 5)
    gm = jnp.broadcast_to(g[None, :, :], (p.shape[0], g.shape[0], 5)).reshape(-1, 5)
    ious = rbox_iou(pm, gm, aligned=True).reshape(p.shape[0], g.shape[0])
    return -ious * weight


def insider_cost(pred_cxcywh: Array, gt_points: Array, weight: float = 1.0) -> Array:
    """0 if the gt point is inside the predicted box else 1. [P, G]."""
    x1 = pred_cxcywh[:, 0] - pred_cxcywh[:, 2] / 2
    y1 = pred_cxcywh[:, 1] - pred_cxcywh[:, 3] / 2
    x2 = pred_cxcywh[:, 0] + pred_cxcywh[:, 2] / 2
    y2 = pred_cxcywh[:, 1] + pred_cxcywh[:, 3] / 2
    gx = gt_points[None, :, 0]
    gy = gt_points[None, :, 1]
    inside = (gx >= x1[:, None]) & (gx <= x2[:, None]) & (gy >= y1[:, None]) & (gy <= y2[:, None])
    return jnp.where(inside, 0.0, 1.0) * weight
