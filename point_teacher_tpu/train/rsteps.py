"""Rotated (OBB) teacher-student train steps.

Capability target: RotatedFCOS_TS.forward_train_burn_in_step{1,2}
(OBB_TOD/mmrotate/models/detectors/rotated_fcos_teacher_student.py:120-305)
with the SODA-A config (burn_in 8000, _point_='center', top_k 3, filter 0.0).
Mirrors train/steps.py with the rotated deltas: synthetic GTs are the rotated
boxes themselves, pseudo boxes are 5-dim, MIL bags rotate, and the pseudo
regression loss decodes through DistanceAnglePointCoder.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..core.raugment import RAugBatch, random_point_in_rboxes, strong_augment_rotated
from ..core.rpseudo import generate_pseudo_rboxes
from ..core.synthetic import generate_black_paper_batch
from ..models.rotated_detector import StudentRotatedFCOS
from ..ops.boxes import grid_points
from ..ops.rotated import rbox_iou
from .config import PointTeacherConfig
from .rdense_losses import RDenseLossCfg, pseudo_branch_loss_rotated, syn_branch_loss_rotated
from .mil import mil_stage_rotated
from .state import Batch, TrainState, ema_update

Array = jnp.ndarray


def _flatten_rhead(outs):
    cls_score, bbox_pred, angle_pred, centerness = outs
    b = cls_score.shape[0]
    return (
        cls_score.reshape(b, -1, cls_score.shape[-1]),
        bbox_pred.reshape(b, -1, 4),
        angle_pred.reshape(b, -1, 1),
        centerness.reshape(b, -1),
    )


def _mil_fns(model, params):
    def regress(feats, stage):
        return model.apply(params, feats, stage, method=StudentRotatedFCOS.mil_regress)

    def classify(feats, stage):
        return model.apply(params, feats, stage, method=StudentRotatedFCOS.mil_classify)

    def classify_neg(feats, stage):
        return model.apply(params, feats, stage,
                           method=StudentRotatedFCOS.mil_classify_neg)

    return regress, classify, classify_neg


def _run_rmil_stages(model, params, mil_feat, rboxes, labels, valid, real_rboxes,
                     cfg: PointTeacherConfig, key, hw, with_bags: bool,
                     metrics: Dict[str, Array]):
    regress, classify, classify_neg = _mil_fns(model, params)
    total = jnp.zeros(())
    cur = rboxes
    for stage in range(cfg.num_stages):
        key, sub = jax.random.split(key)
        out = mil_stage_rotated(
            regress, classify if with_bags else None, classify_neg if with_bags else None,
            mil_feat, cur, labels, valid, real_rboxes,
            cfg.fine_proposal_cfg[stage], cfg.fine_proposal_extensive_cfg[stage],
            stage, hw, cfg.top_k, cfg.beta, cfg.dn_hyper_denoising,
            sub, with_bags,
            window=cfg.mil_pool_window_rotated, grouped=cfg.mil_pool_grouped,
        )
        metrics[f"stage{stage}_loss_mil_bbox"] = out.loss_mil_bbox * cfg.alpha[0]
        metrics[f"stage{stage}_coarse_bags_iou"] = out.coarse_bags_iou
        metrics[f"stage{stage}_refine_bags_iou"] = out.refine_bags_iou
        metrics[f"stage{stage}_cls_pool_coverage"] = out.cls_pool_coverage
        if with_bags:
            metrics[f"stage{stage}_loss_mil_bags"] = out.loss_mil_bags * cfg.alpha[1]
            total = total + out.loss_mil_bbox * cfg.alpha[0] + out.loss_mil_bags * cfg.alpha[1]
            ious = rbox_iou(out.refined_boxes.reshape(-1, 5),
                            real_rboxes.reshape(-1, 5), aligned=True)
            metrics[f"stage{stage}_refine_bboxes_iou"] = (
                jnp.where(valid.reshape(-1), ious, 0.0).sum()
                / jnp.maximum(valid.sum(), 1)
            )
            cur = out.refined_boxes
        else:
            total = total + out.loss_mil_bbox * cfg.alpha[0]
    return cur, total


def build_rotated_train_step(model: StudentRotatedFCOS, tx, cfg: PointTeacherConfig,
                             rdense: RDenseLossCfg = None, donate: bool = False):
    step_fn = _make_rotated_step_fn(model, tx, cfg, rdense)
    return jax.jit(step_fn, static_argnames=("phase1",),
                   donate_argnums=(0,) if donate else ())


def build_rotated_train_step_scan(model: StudentRotatedFCOS, tx,
                                  cfg: PointTeacherConfig,
                                  rdense: RDenseLossCfg = None,
                                  donate: bool = True):
    """k rotated steps per dispatched program (see steps.build_train_step_scan
    — same dispatch-amortisation rationale, identical per-step semantics)."""
    inner = _make_rotated_step_fn(model, tx, cfg, rdense)

    def multi(state: TrainState, batches: Batch, phase1: bool):
        return jax.lax.scan(lambda s, b: inner(s, b, phase1), state, batches)

    return jax.jit(multi, static_argnames=("phase1",),
                   donate_argnums=(0,) if donate else ())


def _make_rotated_step_fn(model: StudentRotatedFCOS, tx, cfg: PointTeacherConfig,
                          rdense: RDenseLossCfg = None):
    if rdense is None:
        rdense = RDenseLossCfg(num_classes=cfg.num_classes)
    points = grid_points(cfg.feat_size, cfg.feat_size, cfg.stride)
    hw = (cfg.img_size, cfg.img_size)

    def step_fn(state: TrainState, batch: Batch, phase1: bool):
        """batch.gt_boxes carry ROTATED boxes [B, G, 5]."""
        rng, k_pts, k_syn, k_aug, k_mil_syn, k_mil = jax.random.split(state.rng, 6)
        teacher_params = ema_update(state.teacher_params, state.params, cfg.ema_alpha)

        # points: cached refined, else sampled (centre for position==0)
        sampled = random_point_in_rboxes(k_pts, batch.gt_boxes, cfg.position)
        cached = state.points_cached[batch.image_ids]
        origin = jnp.where(cached[:, None, None],
                           state.origin_points[batch.image_ids], sampled)
        gt_points = jnp.where(cached[:, None, None],
                              state.refined_points[batch.image_ids], sampled)

        # teacher pseudo rboxes
        outs_t, _ = model.apply(teacher_params, batch.image)
        cls_t, bbox_t, ang_t, _ = _flatten_rhead(outs_t)
        pred5 = jax.lax.stop_gradient(jnp.concatenate([bbox_t, ang_t], -1))
        cls_t = jax.lax.stop_gradient(cls_t)
        ps = jax.vmap(
            lambda cl, bp, gp, gl, gv, gb: generate_pseudo_rboxes(
                points, cl, bp, gp, gl, gv, gb, cfg.filter_score, cfg.fuse_assigner
            )
        )(cls_t, pred5, gt_points, batch.gt_labels, batch.gt_valid, batch.gt_boxes)

        nt = cfg.num_training_burninstep1 if phase1 else cfg.num_training_burninstep2
        sl = slice(0, nt)
        metrics: Dict[str, Array] = {}
        ious_c = rbox_iou(ps["pseudo_boxes"][:, sl].reshape(-1, 5),
                          batch.gt_boxes[:, sl].reshape(-1, 5), aligned=True)
        vm = batch.gt_valid[:, sl].reshape(-1)
        metrics["coarse_bboxes_iou"] = jnp.where(vm, ious_c, 0.0).sum() / jnp.maximum(vm.sum(), 1)
        metrics["pseudo_mean_iou"] = ps["mean_iou"].mean()
        # pseudo-box size stats (decay/blow-up diagnosis, NOTES_r5)
        vm2 = batch.gt_valid[:, sl]
        pwh = jnp.where(vm2[..., None], ps["pseudo_boxes"][:, sl, 2:4], 0.0)
        metrics["pseudo_mean_wh"] = pwh.sum() / jnp.maximum(2 * vm2.sum(), 1)
        metrics["pseudo_max_wh"] = pwh.max()

        if phase1:
            img_syn, _, syn_rboxes, syn_valid = generate_black_paper_batch(
                k_syn, batch.image, batch.gt_boxes, batch.gt_valid, cfg.syn_cfg,
                fill_value=cfg.syn_fill_value,
            )
            order = jnp.argsort(~syn_valid, axis=-1, stable=True)
            syn_rboxes = jnp.take_along_axis(syn_rboxes, order[..., None], axis=1)
            syn_valid = jnp.take_along_axis(syn_valid, order, axis=1)
            gate = syn_valid.any(-1).all()
            gate_f = gate.astype(jnp.float32)
        else:
            img_syn = syn_rboxes = syn_valid = None
            gate = jnp.array(True)
            gate_f = jnp.ones(())

        def refresh_points(refined_full):
            # update_points precedes strong augmentation in the reference
            # (rotated_fcos_teacher_student.py:226,285)
            new_pts = (1 - cfg.lamda) * refined_full[..., :2] + cfg.lamda * origin
            return jnp.where(gate, new_pts, gt_points)

        def make_aug(refined_full):
            return strong_augment_rotated(
                k_aug,
                RAugBatch(
                    image=batch.image,
                    gt_points=refresh_points(refined_full),
                    gt_valid=batch.gt_valid,
                    pseudo_points=refined_full[..., :2],
                    pseudo_rboxes=refined_full,
                    pseudo_valid=batch.gt_valid,
                ),
            )

        if phase1:
            # phase-1 refinement is discarded (rotated_fcos_teacher_student.py
            # :222): the aug view depends only on the coarse pseudo boxes, so
            # the three student passes fuse into one 3B forward
            aug = make_aug(ps["pseudo_boxes"])

        # The ori view's head outputs are never consumed (phase-1 losses read
        # the syn and aug rows only; the ori view exists for its PSAGG feat,
        # which feeds MIL — fcos_p2b_teacher_student.py:159-182 discards the
        # real-view head maps the same way). Running the stride-8 head towers
        # (the densest convs in the program) on 2B instead of 3B rows is
        # exact per-row and saves a third of the tower fwd+bwd.
        apply_feat = lambda p_, x_: model.apply(
            p_, x_, method=lambda m_, xx: m_.extract_feat(xx))
        apply_head = lambda p_, f_: model.apply(
            p_, f_, method=lambda m_, ff: m_.head(ff))
        if cfg.remat:
            apply_feat = jax.checkpoint(apply_feat)
            apply_head = jax.checkpoint(apply_head)

        def loss_fn(params):
            m = dict(metrics)
            if phase1:
                b = batch.image.shape[0]
                img_all = jnp.concatenate([img_syn, batch.image, aug.image], axis=0)
                feat_all = apply_feat(params, img_all)
                outs = apply_head(
                    params, jnp.concatenate([feat_all[:b], feat_all[2 * b:]], axis=0))
                cls_a, bbox_a, ang_a, ctr_a = _flatten_rhead(outs)
                loss_bbox_syn, loss_ctr_syn = syn_branch_loss_rotated(
                    cls_a[:b], bbox_a[:b], ang_a[:b], ctr_a[:b], points,
                    syn_rboxes, syn_valid, rdense,
                )
                mil_feat_syn, mil_feat_ori = feat_all[:b], feat_all[b:2 * b]
                cls_g, bbox_g = cls_a[b:], bbox_a[b:]
                ang_g, ctr_g = ang_a[b:], ctr_a[b:]
                _, mil_loss_syn = _run_rmil_stages(
                    model, params, mil_feat_syn, syn_rboxes[:, :nt],
                    jnp.zeros_like(batch.gt_labels[:, sl]), syn_valid[:, :nt],
                    syn_rboxes[:, :nt], cfg, k_mil_syn, hw, False, m,
                )
                refined, mil_loss_ori = _run_rmil_stages(
                    model, params, mil_feat_ori, ps["pseudo_boxes"][:, sl],
                    ps["pseudo_labels"][:, sl], batch.gt_valid[:, sl],
                    batch.gt_boxes[:, sl], cfg, k_mil, hw, True, m,
                )
                mil_loss = (mil_loss_syn + mil_loss_ori) * gate_f
                refined_full = ps["pseudo_boxes"]  # phase-1 refinement discarded
                aug_local = aug
            else:
                # ori-view head outputs are unused in phase 2 as well — only
                # its feat (MIL) and the aug view's head maps are consumed.
                feat = apply_feat(params, batch.image)
                refined_nt, mil_loss = _run_rmil_stages(
                    model, params, feat, ps["pseudo_boxes"][:, sl],
                    ps["pseudo_labels"][:, sl], batch.gt_valid[:, sl],
                    batch.gt_boxes[:, sl], cfg, k_mil, hw, True, m,
                )
                refined_full = ps["pseudo_boxes"].at[:, sl].set(refined_nt)
                loss_bbox_syn = loss_ctr_syn = None
                aug_local = make_aug(refined_full)
                outs_aug = apply_head(params, apply_feat(params, aug_local.image))
                cls_g, bbox_g, ang_g, ctr_g = _flatten_rhead(outs_aug)

            loss_cls, loss_bbox_ps, loss_ctr_ps = pseudo_branch_loss_rotated(
                cls_g, bbox_g, ang_g, ctr_g, points,
                aug_local.gt_points, batch.gt_labels, aug_local.gt_valid,
                aug_local.pseudo_rboxes, aug_local.pseudo_valid & batch.gt_valid,
                rdense,
            )
            m["loss_cls"] = loss_cls
            if phase1:
                m["loss_bbox"] = loss_bbox_syn
                m["loss_centerness"] = loss_ctr_syn
            else:
                m["loss_bbox"] = loss_bbox_ps
                m["loss_centerness"] = loss_ctr_ps
            total = m["loss_cls"] + m["loss_bbox"] + m["loss_centerness"] + mil_loss
            m["total_loss"] = total
            return total, (m, refined_full)

        (loss, (metrics_out, refined_full)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)

        # point refinement: blend pseudo centres with the original points
        pseudo_centre = refined_full[..., :2]
        new_refined = (1 - cfg.lamda) * pseudo_centre + cfg.lamda * origin
        dist = jnp.sqrt((new_refined - batch.gt_boxes[..., :2]) ** 2) / jnp.sqrt(
            jnp.maximum((batch.gt_boxes[..., 2:4] / 2) ** 2, 1e-12)
        )
        mask = batch.gt_valid[..., None]
        metrics_out["refined_points_distance"] = (
            jnp.where(mask, dist, 0.0).sum() / jnp.maximum(mask.sum() * 1.0, 1.0)
        )
        ids = batch.image_ids
        refined_cache = state.refined_points.at[ids].set(
            jnp.where(gate, new_refined, state.refined_points[ids])
        )
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            teacher_params=teacher_params,
            opt_state=opt_state,
            origin_points=state.origin_points.at[ids].set(origin),
            refined_points=refined_cache,
            points_cached=state.points_cached.at[ids].set(True),
            rng=rng,
        )
        return new_state, metrics_out

    return step_fn
