"""Rotated FCOS target generation (OBB path).

Capability targets in OBB_TOD/mmrotate/models/dense_heads/
rotated_fcos_head_p2rb_ts.py:
- _get_target_single (:671-717): syn assignment on rotated boxes (point cost
  to centres), (l,t,r,b) targets in the rotated box frame + angle target.
- _get_target_pseudo_single (:760-840): cls targets from point assignment,
  reg+angle targets from pseudo rboxes.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.rotated import rbox_ltrb_targets
from .assigners import labels_from_assignment
from .targets import AssignerCfg, assign_points_to_gts

Array = jnp.ndarray


def _take_targets(points, rboxes, assigned):
    idx = jnp.clip(assigned, 0, rboxes.shape[0] - 1)
    ltrb_all = rbox_ltrb_targets(points, rboxes)  # [P, G, 4]
    p = points.shape[0]
    ltrb = ltrb_all[jnp.arange(p), idx]
    angle = rboxes[idx, 4:5]
    return ltrb, angle


def syn_targets_rotated(
    points: Array,
    cls_logits: Array,
    gt_rboxes: Array,      # [G, 5]
    gt_valid: Array,
    num_classes: int,
    cfg: AssignerCfg,
):
    gt_labels = jnp.zeros(gt_rboxes.shape[0], dtype=jnp.int32)
    assigned = assign_points_to_gts(points, cls_logits, gt_rboxes[:, :4], gt_labels,
                                    gt_valid, cfg)
    labels = labels_from_assignment(assigned, gt_labels, num_classes)
    ltrb, angle = _take_targets(points, gt_rboxes, assigned)
    return labels, ltrb, angle


def pseudo_targets_rotated(
    points: Array,
    cls_logits: Array,
    gt_points: Array,
    gt_labels: Array,
    gt_valid: Array,
    pseudo_rboxes: Array,   # [G, 5]
    pseudo_valid: Array,
    num_classes: int,
    cls_assigner: AssignerCfg,
    reg_assigner: AssignerCfg,
):
    gp = jnp.concatenate([gt_points, jnp.zeros_like(gt_points)], axis=-1)
    assigned_cls = assign_points_to_gts(points, cls_logits, gp, gt_labels, gt_valid,
                                        cls_assigner)
    labels = labels_from_assignment(assigned_cls, gt_labels, num_classes)

    assigned_reg = assign_points_to_gts(points, cls_logits, pseudo_rboxes[:, :4],
                                        gt_labels, pseudo_valid, reg_assigner)
    labels_reg = labels_from_assignment(assigned_reg, gt_labels, num_classes)
    ltrb, angle = _take_targets(points, pseudo_rboxes, assigned_reg)
    return labels, labels_reg, ltrb, angle
