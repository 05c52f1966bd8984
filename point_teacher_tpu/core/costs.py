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
