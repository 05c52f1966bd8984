"""Box-supervised FCOS baseline trainer (the reference's upper bound).

Capability target: HBB_TOD/configs/baselines/aitodv2_fcos_r50_1x.py — plain
FCOS trained on real GT boxes (published AP 41.2 at IoU .25, BASELINE.md).
Re-expressed on the Point-Teacher architecture (R50+FPN+PSAGG, single
stride-8 level) with the same Topk point assignment the TS head uses for its
synthetic branch, plus a focal cls loss on the assigned GT labels.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..core.assigners import labels_from_assignment
from ..core.targets import AssignerCfg, assign_points_to_gts, box_targets_for_assignment
from ..models.detector import StudentFCOS
from ..ops.boxes import grid_points, xyxy_to_cxcywh, distance2bbox
from ..ops.losses import (
    binary_cross_entropy, centerness_target, diou_loss, focal_loss_from_labels,
)
from .config import PointTeacherConfig
from .state import Batch, TrainState, ema_update

Array = jnp.ndarray


def build_fcos_train_step(model: StudentFCOS, tx, cfg: PointTeacherConfig,
                          donate: bool = False):
    step_fn = _make_fcos_step_fn(model, tx, cfg)
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def build_fcos_train_step_scan(model: StudentFCOS, tx, cfg: PointTeacherConfig,
                               donate: bool = True):
    """k baseline steps per dispatched program (see steps.build_train_step_scan
    for the dispatch-amortisation rationale; identical per-step semantics)."""
    inner = _make_fcos_step_fn(model, tx, cfg)

    def multi(state: TrainState, batches: Batch):
        return jax.lax.scan(inner, state, batches)

    return jax.jit(multi, donate_argnums=(0,) if donate else ())


def _make_fcos_step_fn(model: StudentFCOS, tx, cfg: PointTeacherConfig):
    cfg = cfg.normalized()
    points = grid_points(cfg.feat_size, cfg.feat_size, cfg.stride)
    assigner = cfg.dense.syn_assigner

    def step_fn(state: TrainState, batch: Batch):
        rng, _ = jax.random.split(state.rng)

        def loss_fn(params):
            outs, _ = model.apply(params, batch.image)
            cls_score, bbox_pred, centerness = outs
            b = cls_score.shape[0]
            cls_f = cls_score.reshape(b, -1, cfg.num_classes)
            bbox_f = bbox_pred.reshape(b, -1, 4)
            ctr_f = centerness.reshape(b, -1)

            def single(cl, gb, gl, gv):
                gc = xyxy_to_cxcywh(gb)
                assigned = assign_points_to_gts(points, cl, gc, gl, gv, assigner)
                labels = labels_from_assignment(assigned, gl, cfg.num_classes)
                tgts = box_targets_for_assignment(points, gb, assigned)
                return labels, tgts

            labels, tgts = jax.vmap(single)(cls_f, batch.gt_boxes, batch.gt_labels,
                                            batch.gt_valid)
            pos = labels < cfg.num_classes
            num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)
            loss_cls = focal_loss_from_labels(
                cls_f.reshape(-1, cfg.num_classes), labels.reshape(-1),
                cfg.num_classes, avg_factor=num_pos,
            )
            ctr_t = jnp.where(pos, centerness_target(tgts), 0.0)
            denorm = jnp.maximum(jax.lax.stop_gradient(ctr_t.sum()), 1e-6)
            p = points.shape[0]
            pts = jnp.broadcast_to(points[None], (b, p, 2))
            loss_bbox = diou_loss(
                distance2bbox(pts, bbox_f).reshape(-1, 4),
                distance2bbox(pts, tgts).reshape(-1, 4),
                weight=ctr_t.reshape(-1), avg_factor=denorm,
            )
            loss_ctr = binary_cross_entropy(
                ctr_f.reshape(-1), ctr_t.reshape(-1),
                weight=pos.reshape(-1).astype(jnp.float32), avg_factor=num_pos,
            )
            total = loss_cls + loss_bbox + loss_ctr
            m: Dict[str, Array] = dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                                       loss_centerness=loss_ctr, total_loss=total)
            return total, m

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(lambda pp, u: pp + u, state.params, updates)
        # EMA teacher kept for evaluation parity with the TS pipeline
        teacher_params = ema_update(state.teacher_params, state.params, cfg.ema_alpha)
        new_state = state.replace(
            step=state.step + 1, params=params, teacher_params=teacher_params,
            opt_state=opt_state, rng=rng,
        )
        return new_state, metrics

    return step_fn
