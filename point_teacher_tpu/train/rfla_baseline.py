"""Box-supervised RFLA-FCOS baseline trainer (multi-level, RFLA assignment).

Capability target: the loss of RFLA_FCOSHead
(HBB_TOD/mmdet/models/dense_heads/rfla_fcos_head.py:188-303): focal cls loss
normalised by the global positive count, centerness-weighted IoU(-log) loss on
decoded boxes normalised by the centerness-target sum, BCE centerness loss —
with targets from the RFLA hierarchical assigner instead of regress ranges.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..core.rfla import HieAssignerCfg
from ..models.rfla_fcos_head import RFLAFCOS, level_points_and_rfields, rfla_targets
from ..ops.boxes import distance2bbox
from ..ops.losses import (
    binary_cross_entropy, centerness_target, focal_loss_from_labels, iou_loss,
)
from .config import PointTeacherConfig
from .state import Batch, TrainState, ema_update

Array = jnp.ndarray


def build_rfla_train_step(model: RFLAFCOS, tx, cfg: PointTeacherConfig,
                          assigner: HieAssignerCfg = HieAssignerCfg(),
                          donate: bool = False):
    step_fn = _make_rfla_step_fn(model, tx, cfg, assigner)
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def build_rfla_train_step_scan(model: RFLAFCOS, tx, cfg: PointTeacherConfig,
                               assigner: HieAssignerCfg = HieAssignerCfg(),
                               donate: bool = True):
    """k baseline steps per dispatched program (see steps.build_train_step_scan
    for the dispatch-amortisation rationale; identical per-step semantics)."""
    inner = _make_rfla_step_fn(model, tx, cfg, assigner)

    def multi(state: TrainState, batches: Batch):
        return jax.lax.scan(inner, state, batches)

    return jax.jit(multi, donate_argnums=(0,) if donate else ())


def _make_rfla_step_fn(model: RFLAFCOS, tx, cfg: PointTeacherConfig,
                       assigner: HieAssignerCfg):
    points, rfields, _, _ = level_points_and_rfields(cfg.img_size, model.strides)

    def step_fn(state: TrainState, batch: Batch):
        rng, _ = jax.random.split(state.rng)

        def loss_fn(params):
            outs = model.apply(params, batch.image)
            cls_f, bbox_f, ctr_f = model.flatten_outs(outs)
            b = cls_f.shape[0]

            labels, tgts = jax.vmap(
                lambda gb, gl, gv: rfla_targets(points, rfields, gb, gl, gv,
                                                cfg.num_classes, assigner)
            )(batch.gt_boxes, batch.gt_labels, batch.gt_valid)

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
            loss_bbox = iou_loss(
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
                                       loss_centerness=loss_ctr, total_loss=total,
                                       num_pos=num_pos)
            return total, m

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(lambda pp, u: pp + u, state.params, updates)
        teacher_params = ema_update(state.teacher_params, state.params, cfg.ema_alpha)
        new_state = state.replace(
            step=state.step + 1, params=params, teacher_params=teacher_params,
            opt_state=opt_state, rng=rng,
        )
        return new_state, metrics

    return step_fn
