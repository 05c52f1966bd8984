"""FCOS-style target generation for the three training paths.

Parity targets:
- synthetic (box-supervised) path: fcos_head_p2b_ts.py:536-605
  (get_targets/_get_target_single using syn_assigner)
- pseudo path: fcos_head_p2b_ts.py:607-708
  (get_target_pseudo/_get_target_pseudo_single: cls targets from `assigner`
  on refined points, reg targets from `pseudo_assigner` on pseudo boxes)

All functions operate on one image with padded GTs and are vmapped over the
batch by the caller.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops.boxes import bbox2distance, xyxy_to_cxcywh
from .assigners import labels_from_assignment, topk_assign
from .costs import focal_cost, point_cost

Array = jnp.ndarray


class AssignerCfg(NamedTuple):
    num_pre: int = 3
    topk: int = 3
    cls_weight: float = 0.0
    reg_weight: float = 1.0
    reg_mode: str = "L1"


def assign_points_to_gts(
    points: Array,
    cls_logits: Array,
    gt_cxcywh: Array,
    gt_labels: Array,
    gt_valid: Array,
    cfg: AssignerCfg,
) -> Array:
    """TopkAssigner.assign equivalent. Returns assigned [P] (0-based, -1 bg)."""
    reg = point_cost(points, gt_cxcywh, weight=cfg.reg_weight, mode=cfg.reg_mode)
    if cfg.num_pre > cfg.topk:
        stage2 = focal_cost(cls_logits, gt_labels, weight=cfg.cls_weight)
    else:
        stage2 = jnp.zeros_like(reg)
    return topk_assign(reg, stage2, gt_valid, cfg.num_pre, cfg.topk)


def box_targets_for_assignment(points: Array, gt_xyxy: Array, assigned: Array) -> Array:
    """(l, t, r, b) targets; unassigned points take GT row 0 (reference quirk,
    harmless because they are background in the labels)."""
    idx = jnp.clip(assigned, 0, gt_xyxy.shape[0] - 1)
    return bbox2distance(points, gt_xyxy[idx])


def syn_targets(
    points: Array,
    cls_logits: Array,
    gt_xyxy: Array,
    gt_valid: Array,
    num_classes: int,
    cfg: AssignerCfg,
):
    """Box-supervised targets (synthetic branch). GT labels are all-zero in the
    reference (_get_target_single:576). Returns (labels [P], bbox_targets [P,4])."""
    gt_labels = jnp.zeros(gt_xyxy.shape[0], dtype=jnp.int32)
    gt_cxcywh = xyxy_to_cxcywh(gt_xyxy)
    assigned = assign_points_to_gts(points, cls_logits, gt_cxcywh, gt_labels, gt_valid, cfg)
    labels = labels_from_assignment(assigned, gt_labels, num_classes)
    bbox_targets = box_targets_for_assignment(points, gt_xyxy, assigned)
    return labels, bbox_targets


def pseudo_targets(
    points: Array,
    cls_logits: Array,
    gt_points: Array,
    gt_labels: Array,
    gt_valid: Array,
    pseudo_xyxy: Array,
    pseudo_labels: Array,
    pseudo_valid: Array,
    num_classes: int,
    cls_assigner: AssignerCfg,
    reg_assigner: AssignerCfg,
):
    """Targets for the strongly-augmented student pass.

    cls targets come from assigning grid points to the (refined) annotation
    points; reg targets from assigning to the pseudo boxes.
    Returns (labels [P], labels_reg [P], bbox_targets [P,4]).
    """
    # classification: gt_points as (cx, cy) "boxes"
    gp = jnp.concatenate([gt_points, jnp.zeros_like(gt_points)], axis=-1)
    assigned_cls = assign_points_to_gts(points, cls_logits, gp, gt_labels, gt_valid, cls_assigner)
    labels = labels_from_assignment(assigned_cls, gt_labels, num_classes)

    # regression: pseudo boxes
    ps_cxcywh = xyxy_to_cxcywh(pseudo_xyxy)
    assigned_reg = assign_points_to_gts(
        points, cls_logits, ps_cxcywh, pseudo_labels, pseudo_valid, reg_assigner
    )
    labels_reg = labels_from_assignment(assigned_reg, pseudo_labels, num_classes)
    bbox_targets = box_targets_for_assignment(points, pseudo_xyxy, assigned_reg)
    return labels, labels_reg, bbox_targets
