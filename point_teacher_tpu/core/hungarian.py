"""Point-Hungarian assignment (one-to-one), host-side.

Capability target: PHungarianAssigner
(HBB_TOD/mmdet/core/bbox/assigners/p_hungarian_assigner.py:40-100 and the OBB
point_hungarian_assigner.py): cost = focal cls cost + centerness-vs-1 L1 cost
+ insider (point-in-box) cost, solved with scipy linear_sum_assignment.

It is the default `fuse_assigner` in the head signature
(fcos_head_p2b_ts.py:132-136) but every shipped config overrides it with
FUSETopkAssigner, so it is off the jitted hot path; like the reference, it
runs on the host (scipy), offered for config parity and experimentation. A
device-side one-to-one alternative is `topk_assign` with num_pre=topk=1.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np


class HungarianCfg(NamedTuple):
    cls_weight: float = 1.0
    center_weight: float = 1.0
    insider_weight: float = 1.0
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0


def hungarian_assign_np(
    pred_cxcywh: np.ndarray,   # [P, 4] decoded boxes
    cls_logits: np.ndarray,    # [P, C]
    centerness: np.ndarray,    # [P] logits
    gt_points: np.ndarray,     # [G, 2]
    gt_labels: np.ndarray,     # [G]
    gt_valid: np.ndarray,      # [G] bool
    cfg: HungarianCfg = HungarianCfg(),
) -> np.ndarray:
    """Returns assigned [P] int64: 0-based gt index, -1 background."""
    from scipy.optimize import linear_sum_assignment

    p = pred_cxcywh.shape[0]
    assigned = np.full(p, -1, np.int64)
    idx = np.nonzero(gt_valid)[0]
    if len(idx) == 0 or p == 0:
        return assigned
    gpts = gt_points[idx]
    glab = gt_labels[idx]

    # focal cls cost (match_cost.py:54-99 semantics)
    prob = 1.0 / (1.0 + np.exp(-cls_logits))
    eps = 1e-12
    neg = -np.log(1 - prob + eps) * (1 - cfg.focal_alpha) * prob ** cfg.focal_gamma
    pos = -np.log(prob + eps) * cfg.focal_alpha * (1 - prob) ** cfg.focal_gamma
    cls_cost = (pos - neg)[:, glab] * cfg.cls_weight

    # centerness L1 cost against target 1 (CenternessCost, match_cost.py:254)
    ctr = 1.0 / (1.0 + np.exp(-centerness))
    center_cost = np.abs(ctr[:, None] - 1.0) * np.ones((1, len(idx))) * cfg.center_weight

    # insider cost (InsiderCost, match_cost.py:216)
    x1 = pred_cxcywh[:, 0] - pred_cxcywh[:, 2] / 2
    y1 = pred_cxcywh[:, 1] - pred_cxcywh[:, 3] / 2
    x2 = pred_cxcywh[:, 0] + pred_cxcywh[:, 2] / 2
    y2 = pred_cxcywh[:, 1] + pred_cxcywh[:, 3] / 2
    inside = ((gpts[None, :, 0] >= x1[:, None]) & (gpts[None, :, 0] <= x2[:, None])
              & (gpts[None, :, 1] >= y1[:, None]) & (gpts[None, :, 1] <= y2[:, None]))
    location_cost = np.where(inside, 0.0, 1.0) * cfg.insider_weight

    cost = cls_cost + center_cost + location_cost
    rows, cols = linear_sum_assignment(cost)
    assigned[rows] = idx[cols]
    return assigned
