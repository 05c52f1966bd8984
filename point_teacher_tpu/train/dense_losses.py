"""Dense-head losses for the three training paths (batched, mask-padded).

Capability targets in fcos_head_p2b_ts.py:
- `loss` (:470-534): box-supervised branch (synthetic boxes) — DIoU weighted
  by centerness targets + centerness BCE. (Its cls loss is never used: the
  phase-1 cls loss comes from loss_pseudo — fcos_p2b_teacher_student.py:206.)
- `loss_pseudo` (:380-465): focal cls loss from point assignment + DN-DIoU
  regression against pseudo boxes + centerness BCE.

`num_pos` / centerness denominators are computed over the global batch, which
under pjit data parallelism reproduces the reference's `reduce_mean` across
GPUs for free.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.boxes import distance2bbox
from ..ops.losses import (
    binary_cross_entropy,
    centerness_target,
    diou_loss,
    dn_diou_loss,
    focal_loss_from_labels,
)
from ..core.targets import AssignerCfg, pseudo_targets, syn_targets

Array = jnp.ndarray


class DenseLossCfg(NamedTuple):
    num_classes: int = 8
    syn_assigner: AssignerCfg = AssignerCfg(num_pre=3, topk=3, cls_weight=0.0, reg_weight=1.0)
    cls_assigner: AssignerCfg = AssignerCfg(num_pre=1, topk=1, cls_weight=1.0, reg_weight=1.0)
    pseudo_assigner: AssignerCfg = AssignerCfg(num_pre=3, topk=3, cls_weight=0.0, reg_weight=1.0)
    dn_hyper_burn2: float = 0.1
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0


def _reg_and_centerness_loss(bbox_pred, centerness, points, labels, bbox_targets,
                             num_classes, loss_fn):
    """Shared positive-sample DIoU/DN-DIoU + centerness computation."""
    b, p = labels.shape
    pos = labels < num_classes  # [B, P]
    num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)

    ctr_targets = centerness_target(bbox_targets)  # [B, P]
    ctr_targets = jnp.where(pos, ctr_targets, 0.0)
    denorm = jnp.maximum(jax.lax.stop_gradient(ctr_targets.sum()), 1e-6)

    pts = jnp.broadcast_to(points[None], (b, p, 2))
    decoded_pred = distance2bbox(pts, bbox_pred)
    decoded_tgt = distance2bbox(pts, bbox_targets)
    # base_valid: the reference gathers positives before the loss call
    # (fcos_head_p2b_ts.py:441-457) — the DN scalar-mean base runs over them
    loss_bbox = loss_fn(
        decoded_pred.reshape(-1, 4), decoded_tgt.reshape(-1, 4),
        weight=ctr_targets.reshape(-1), avg_factor=denorm,
        base_valid=pos.reshape(-1),
    )
    loss_ctr = binary_cross_entropy(
        centerness.reshape(-1), ctr_targets.reshape(-1),
        weight=pos.reshape(-1).astype(jnp.float32), avg_factor=num_pos,
    )
    return loss_bbox, loss_ctr


def syn_branch_loss(
    cls_logits: Array,      # [B, P, C]
    bbox_pred: Array,       # [B, P, 4] (pixels)
    centerness: Array,      # [B, P]
    points: Array,          # [P, 2]
    syn_boxes: Array,       # [B, S, 4] xyxy
    syn_valid: Array,       # [B, S]
    cfg: DenseLossCfg,
):
    """Box-supervised loss on the synthetic view -> (loss_bbox, loss_centerness)."""
    labels, bbox_targets = jax.vmap(
        lambda cl, gb, gv: syn_targets(points, cl, gb, gv, cfg.num_classes, cfg.syn_assigner)
    )(cls_logits, syn_boxes, syn_valid)
    return _reg_and_centerness_loss(
        bbox_pred, centerness, points, labels, bbox_targets, cfg.num_classes,
        lambda *a, base_valid=None, **kw: diou_loss(*a, **kw),
    )


def pseudo_branch_loss(
    cls_logits: Array,
    bbox_pred: Array,
    centerness: Array,
    points: Array,
    gt_points: Array,       # [B, G, 2] (refined annotation points, augmented)
    gt_labels: Array,       # [B, G]
    gt_valid: Array,        # [B, G]
    pseudo_boxes: Array,    # [B, G, 4]
    pseudo_valid: Array,    # [B, G]
    cfg: DenseLossCfg,
):
    """loss_pseudo -> (loss_cls, loss_bbox, loss_centerness)."""
    labels, labels_reg, bbox_targets = jax.vmap(
        lambda cl, gp, gl, gv, pb, pv: pseudo_targets(
            points, cl, gp, gl, gv, pb, gl, pv, cfg.num_classes,
            cfg.cls_assigner, cfg.pseudo_assigner,
        )
    )(cls_logits, gt_points, gt_labels, gt_valid, pseudo_boxes, pseudo_valid)

    pos_cls = labels < cfg.num_classes
    num_pos_cls = jnp.maximum(pos_cls.sum().astype(jnp.float32), 1.0)
    loss_cls = focal_loss_from_labels(
        cls_logits.reshape(-1, cfg.num_classes), labels.reshape(-1),
        cfg.num_classes, avg_factor=num_pos_cls,
        alpha=cfg.focal_alpha, gamma=cfg.focal_gamma,
    )

    def dn(pred, tgt, weight=None, avg_factor=None, base_valid=None):
        return dn_diou_loss(pred, tgt, weight=weight, avg_factor=avg_factor,
                            hyper=cfg.dn_hyper_burn2, base_valid=base_valid)

    loss_bbox, loss_ctr = _reg_and_centerness_loss(
        bbox_pred, centerness, points, labels_reg, bbox_targets, cfg.num_classes, dn
    )
    return loss_cls, loss_bbox, loss_ctr
