"""The two jitted train steps (burn-in phase 1 / phase 2).

Capability targets:
- phase 1: fcos_p2b_teacher_student.py:141-211 (forward_train_burn_in_step1)
- phase 2: :213-252 (forward_train_burn_in_step2)
- orchestration: forward_train :116-139 (EMA first, point cache, phase switch
  on a host-side step counter — two compiled programs, no traced branching)

Faithfully-preserved quirks (SURVEY.md §7):
- phase-1 MIL refinement is computed then DISCARDED (:187) — the refined boxes
  feed only diagnostics/point refinement; the student regresses coarse pseudo
  boxes;
- phase-1 cls loss comes from the pseudo branch while bbox/centerness come
  from the synthetic branch (:206-208);
- MIL losses and the point update are gated on EVERY image having >= 1 valid
  synthetic box (:368-372);
- point refinement blends with the ORIGINAL cached point:
  refined = (1-lamda) * pseudo_centre + lamda * origin (:266-274).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..core.augment import AugBatch, random_point_in_boxes, strong_augment
from ..core.pseudo import generate_pseudo_boxes
from ..core.synthetic import generate_black_paper_batch
from ..models.detector import StudentFCOS
from ..ops.boxes import bbox_overlaps, grid_points, xyxy_to_cxcywh
from .config import PointTeacherConfig
from .dense_losses import pseudo_branch_loss, syn_branch_loss
from .mil import mil_stage, mil_stage_pair_phase1
from .state import Batch, TrainState, ema_update

Array = jnp.ndarray


def _flatten_head(outs):
    """(cls [B,h,w,C], bbox [B,h,w,4], ctr [B,h,w,1]) -> per-point [B,P,*]."""
    cls_score, bbox_pred, centerness = outs
    b = cls_score.shape[0]
    return (
        cls_score.reshape(b, -1, cls_score.shape[-1]),
        bbox_pred.reshape(b, -1, 4),
        centerness.reshape(b, -1),
    )


def _teacher_pseudo(model: StudentFCOS, teacher_params, batch: Batch, gt_points,
                    points, cfg: PointTeacherConfig):
    """Teacher forward + pseudo-box generation (all stop-gradient)."""
    outs, _ = model.apply(teacher_params, batch.image)
    cls_t, bbox_t, _ = _flatten_head(outs)
    cls_t = jax.lax.stop_gradient(cls_t)
    bbox_t = jax.lax.stop_gradient(bbox_t)
    res = jax.vmap(
        lambda cl, bp, gp, gl, gv, gb: generate_pseudo_boxes(
            points, cl, bp, gp, gl, gv, gb, cfg.filter_score, cfg.fuse_assigner
        )
    )(cls_t, bbox_t, gt_points, batch.gt_labels, batch.gt_valid, batch.gt_boxes)
    return res


def _gather_points(state: TrainState, batch: Batch, key, cfg: PointTeacherConfig):
    """genrate_points equivalent: cached refined points, else fresh sample."""
    sampled = random_point_in_boxes(key, batch.gt_boxes, cfg.position)
    cached = state.points_cached[batch.image_ids]  # [B]
    origin = jnp.where(cached[:, None, None], state.origin_points[batch.image_ids], sampled)
    refined = jnp.where(cached[:, None, None], state.refined_points[batch.image_ids], sampled)
    return origin, refined


def _mil_fns(model: StudentFCOS, params):
    def regress(feats, stage):
        return model.apply(params, feats, stage, method=StudentFCOS.mil_regress)

    def classify(feats, stage):
        return model.apply(params, feats, stage, method=StudentFCOS.mil_classify)

    def classify_neg(feats, stage):
        return model.apply(params, feats, stage, method=StudentFCOS.mil_classify_neg)

    return regress, classify, classify_neg


def _run_mil_stages(model, params, mil_feat, boxes, labels, valid, real_boxes,
                    cfg: PointTeacherConfig, key, hw, with_bags: bool,
                    metrics: Dict[str, Array], prefix: str = ""):
    """Unrolled MIL stage loop; returns (refined boxes, total weighted loss)."""
    regress, classify, classify_neg = _mil_fns(model, params)
    total = jnp.zeros(())
    cur = boxes
    for stage in range(cfg.num_stages):
        key, sub = jax.random.split(key)
        out = mil_stage(
            regress, classify if with_bags else None, classify_neg if with_bags else None,
            mil_feat, cur, labels, valid, real_boxes,
            cfg.fine_proposal_cfg[stage], cfg.fine_proposal_extensive_cfg[stage],
            stage, hw, cfg.top_k, cfg.beta, cfg.dn_hyper_denoising,
            sub, with_bags,
            window=cfg.mil_pool_window, grouped=cfg.mil_pool_grouped,
        )
        metrics[f"{prefix}stage{stage}_loss_mil_bbox"] = out.loss_mil_bbox * cfg.alpha[0]
        metrics[f"{prefix}stage{stage}_coarse_bags_iou"] = out.coarse_bags_iou
        metrics[f"{prefix}stage{stage}_refine_bags_iou"] = out.refine_bags_iou
        metrics[f"{prefix}stage{stage}_cls_pool_coverage"] = out.cls_pool_coverage
        if with_bags:
            metrics[f"{prefix}stage{stage}_loss_mil_bags"] = out.loss_mil_bags * cfg.alpha[1]
            total = total + out.loss_mil_bbox * cfg.alpha[0] + out.loss_mil_bags * cfg.alpha[1]
            # stage-chained refinement
            ious = bbox_overlaps(out.refined_boxes, real_boxes, is_aligned=True)
            metrics[f"stage{stage}_refine_bboxes_iou"] = (
                jnp.where(valid, ious, 0.0).sum() / jnp.maximum(valid.sum(), 1)
            )
            cur = out.refined_boxes
        else:
            total = total + out.loss_mil_bbox * cfg.alpha[0]
    return cur, total


def _run_mil_stages_pair(model, params, feat_syn, syn_boxes, syn_valid,
                         feat_ori, boxes, labels, valid, real_boxes,
                         cfg: PointTeacherConfig, key, hw,
                         metrics: Dict[str, Array]):
    """Phase-1 MIL: the syn (reg-only) and real branches fused per stage so
    both run through ONE reg-tower matmul (mil_stage_pair_phase1). Metric
    keys and key-chaining match the two sequential _run_mil_stages calls
    exactly: the syn branch's stage keys are written first and overwritten
    by the real branch's (the pre-r5 behaviour), and the negative-proposal
    keys split off `key` exactly as the ori call's chain did."""
    regress, classify, classify_neg = _mil_fns(model, params)
    total_syn = jnp.zeros(())
    total_ori = jnp.zeros(())
    cur = boxes
    for stage in range(cfg.num_stages):
        key, sub = jax.random.split(key)
        syn_out, out = mil_stage_pair_phase1(
            regress, classify, classify_neg,
            feat_syn, syn_boxes, syn_valid,
            feat_ori, cur, labels, valid, real_boxes,
            cfg.fine_proposal_cfg[stage], cfg.fine_proposal_extensive_cfg[stage],
            stage, hw, cfg.top_k, cfg.beta, cfg.dn_hyper_denoising, sub,
            window=cfg.mil_pool_window, grouped=cfg.mil_pool_grouped,
        )
        total_syn = total_syn + syn_out.loss_mil_bbox * cfg.alpha[0]
        metrics[f"stage{stage}_loss_mil_bbox"] = out.loss_mil_bbox * cfg.alpha[0]
        metrics[f"stage{stage}_coarse_bags_iou"] = out.coarse_bags_iou
        metrics[f"stage{stage}_refine_bags_iou"] = out.refine_bags_iou
        metrics[f"stage{stage}_cls_pool_coverage"] = out.cls_pool_coverage
        metrics[f"stage{stage}_loss_mil_bags"] = out.loss_mil_bags * cfg.alpha[1]
        total_ori = total_ori + out.loss_mil_bbox * cfg.alpha[0] + out.loss_mil_bags * cfg.alpha[1]
        ious = bbox_overlaps(out.refined_boxes, real_boxes, is_aligned=True)
        metrics[f"stage{stage}_refine_bboxes_iou"] = (
            jnp.where(valid, ious, 0.0).sum() / jnp.maximum(valid.sum(), 1)
        )
        cur = out.refined_boxes
    return cur, total_syn, total_ori


def _point_update(state: TrainState, batch: Batch, origin, refined_boxes, gate,
                  cfg: PointTeacherConfig, metrics: Dict[str, Array]):
    """update_points: refined = (1-lamda)*pseudo_centre + lamda*origin, cached."""
    pseudo_centre = xyxy_to_cxcywh(refined_boxes)[..., :2]
    new_refined = (1 - cfg.lamda) * pseudo_centre + cfg.lamda * origin
    gt_c = xyxy_to_cxcywh(batch.gt_boxes)
    dist = jnp.sqrt((new_refined - gt_c[..., :2]) ** 2) / jnp.sqrt(
        jnp.maximum((gt_c[..., 2:4] / 2) ** 2, 1e-12)
    )
    mask = batch.gt_valid[..., None]
    metrics["refined_points_distance"] = (
        jnp.where(mask, dist, 0.0).sum() / jnp.maximum(mask.sum(), 1)
    )
    write = gate  # only commit when the MIL branch ran (phase-1 gate)
    ids = batch.image_ids
    cur_refined = state.refined_points.at[ids].set(
        jnp.where(write, new_refined, state.refined_points[ids])
    )
    origin_cache = state.origin_points.at[ids].set(origin)
    cached = state.points_cached.at[ids].set(True)
    return origin_cache, cur_refined, cached, new_refined


def build_train_step(model: StudentFCOS, tx, cfg: PointTeacherConfig, donate: bool = False):
    """Returns jitted train_step(state, batch, phase1: bool static).

    `donate=True` donates the input state's buffers (use in the training loop;
    leave off when the caller keeps references to the old state).
    """
    step_fn = _make_step_fn(model, tx, cfg)
    return jax.jit(step_fn, static_argnames=("phase1",),
                   donate_argnums=(0,) if donate else ())


def _make_step_fn(model: StudentFCOS, tx, cfg: PointTeacherConfig):
    cfg = cfg.normalized()
    points = grid_points(cfg.feat_size, cfg.feat_size, cfg.stride)
    hw = (cfg.img_size, cfg.img_size)

    def step_fn(state: TrainState, batch: Batch, phase1: bool):
        rng, k_pts, k_syn, k_aug, k_mil_syn, k_mil = jax.random.split(state.rng, 6)
        teacher_params = ema_update(state.teacher_params, state.params, cfg.ema_alpha)

        origin, gt_points = _gather_points(state, batch, k_pts, cfg)

        # teacher pseudo boxes (stop-grad)
        ps = _teacher_pseudo(model, teacher_params, batch, gt_points, points, cfg)

        nt = cfg.num_training_burninstep1 if phase1 else cfg.num_training_burninstep2
        sl = slice(0, nt)
        metrics: Dict[str, Array] = {}
        ious_coarse = bbox_overlaps(ps["pseudo_boxes"][:, sl], batch.gt_boxes[:, sl],
                                    is_aligned=True)
        vmask = batch.gt_valid[:, sl]
        metrics["coarse_bboxes_iou"] = (
            jnp.where(vmask, ious_coarse, 0.0).sum() / jnp.maximum(vmask.sum(), 1)
        )
        metrics["pseudo_mean_iou"] = ps["mean_iou"].mean()
        # pseudo-box size stats (decay/blow-up diagnosis, NOTES_r5)
        pwh = (ps["pseudo_boxes"][:, sl, 2:4] - ps["pseudo_boxes"][:, sl, :2])
        pwh = jnp.where(vmask[..., None], pwh, 0.0)
        metrics["pseudo_mean_wh"] = pwh.sum() / jnp.maximum(2 * vmask.sum(), 1)
        metrics["pseudo_max_wh"] = pwh.max()

        if phase1:
            img_syn, syn_boxes, _, syn_valid = generate_black_paper_batch(
                k_syn, batch.image, batch.gt_boxes, batch.gt_valid, cfg.syn_cfg,
                fill_value=cfg.syn_fill_value,
            )
            # compact valid synthetic boxes to the front so the [:num_training]
            # cap keeps real boxes (reference slices a dense list)
            order = jnp.argsort(~syn_valid, axis=-1, stable=True)
            syn_boxes = jnp.take_along_axis(syn_boxes, order[..., None], axis=1)
            syn_valid = jnp.take_along_axis(syn_valid, order, axis=1)
            # reference gate: MIL runs only if EVERY image kept >= 1 syn box
            # (forward_mil_head_burn_in_step1:368-372)
            gate = syn_valid.any(-1).all()
            gate_f = gate.astype(jnp.float32)
        else:
            img_syn = syn_boxes = syn_valid = None
            gate = jnp.array(True)
            gate_f = jnp.ones(())

        def refresh_points(refined_full):
            """update_points runs BEFORE strong augmentation in the reference
            (fcos_p2b_teacher_student.py:191,233): the augmented view uses the
            freshly refined annotation points (a no-op for lamda=1)."""
            pseudo_centre = xyxy_to_cxcywh(refined_full)[..., :2]
            new_pts = (1 - cfg.lamda) * pseudo_centre + cfg.lamda * origin
            return jnp.where(gate, new_pts, gt_points)

        def make_aug(refined_full):
            refined_pts = xyxy_to_cxcywh(refined_full)[..., :2]
            return strong_augment(
                k_aug,
                AugBatch(
                    image=batch.image,
                    gt_points=refresh_points(refined_full),
                    gt_valid=batch.gt_valid,
                    pseudo_points=refined_pts,
                    pseudo_boxes=refined_full,
                    # all real GT slots carry a pseudo box (unmatched slots get
                    # the default 8x8 point box, as in _gnerate_pseudo_single).
                    # ps["pseudo_valid"] (the filter_score gate) is
                    # deliberately NOT consumed: the reference discards
                    # valid_inds at both get_pseudo_bbox call sites
                    # (fcos_p2b_teacher_student.py:176,218 `..., _, _ =`) and
                    # never calls filter_pseudo_bbox (:358) — filter_score is
                    # dead code there (configs set 0.0), verified in r2.
                    pseudo_valid=batch.gt_valid,
                ),
            )

        if phase1:
            # phase-1 quirk: MIL refinement is discarded, so the augmented view
            # depends only on the (teacher) coarse pseudo boxes — build it
            # outside loss_fn and fuse ALL THREE student passes into one 3B
            # forward (syn + ori + aug) for MXU utilisation.
            aug = make_aug(ps["pseudo_boxes"])

        # The ori view's head outputs are never consumed (the losses read the
        # syn and aug rows only; the ori view exists for its PSAGG feat, which
        # feeds MIL — fcos_p2b_teacher_student.py:159-182 discards the
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
                cls_all, bbox_all, ctr_all = _flatten_head(outs)
                loss_bbox_syn, loss_ctr_syn = syn_branch_loss(
                    cls_all[:b], bbox_all[:b], ctr_all[:b], points,
                    syn_boxes, syn_valid, cfg.dense,
                )
                mil_feat_syn, mil_feat_ori = feat_all[:b], feat_all[b:2 * b]
                cls_a = cls_all[b:]
                bbox_a = bbox_all[b:]
                ctr_a = ctr_all[b:]

                # MIL: denoising reg on synthetic bags (exact boxes)...
                # NOTE the r5 fused variant (_run_mil_stages_pair: both
                # branches through ONE reg-tower matmul, bit-exact) MEASURED
                # SLOWER end-to-end (bench_p1_v3 26.29 vs v2 27.14 imgs/s):
                # the [2BN, 12544] concat materializes two ~500 MB row
                # copies, outweighing the saved launch. Kept (and pinned by
                # tests/test_mil_fused.py) as the recorded attempt.
                _, mil_loss_syn = _run_mil_stages(
                    model, params, mil_feat_syn, syn_boxes[:, :nt],
                    jnp.zeros_like(batch.gt_labels[:, sl]), syn_valid[:, :nt],
                    syn_boxes[:, :nt], cfg, k_mil_syn, hw, with_bags=False, metrics=m,
                )
                # ...bag selection/classification on real-image pseudo bags
                refined, mil_loss_ori = _run_mil_stages(
                    model, params, mil_feat_ori, ps["pseudo_boxes"][:, sl],
                    ps["pseudo_labels"][:, sl], batch.gt_valid[:, sl],
                    batch.gt_boxes[:, sl], cfg, k_mil, hw, with_bags=True, metrics=m,
                )
                mil_loss = (mil_loss_syn + mil_loss_ori) * gate_f
                # phase-1 quirk: refinement discarded
                refined_full = ps["pseudo_boxes"]
                aug_local = aug
            else:
                # ori-view head outputs are unused in phase 2 as well — only
                # its feat (MIL) and the aug view's head maps are consumed.
                feat = apply_feat(params, batch.image)
                refined_nt, mil_loss = _run_mil_stages(
                    model, params, feat, ps["pseudo_boxes"][:, sl],
                    ps["pseudo_labels"][:, sl], batch.gt_valid[:, sl],
                    batch.gt_boxes[:, sl], cfg, k_mil, hw, with_bags=True, metrics=m,
                )
                refined_full = ps["pseudo_boxes"].at[:, sl].set(refined_nt)
                loss_bbox_syn = loss_ctr_syn = None
                aug_local = make_aug(refined_full)
                outs_aug = apply_head(params, apply_feat(params, aug_local.image))
                cls_a, bbox_a, ctr_a = _flatten_head(outs_aug)

            loss_cls, loss_bbox_ps, loss_ctr_ps = pseudo_branch_loss(
                cls_a, bbox_a, ctr_a, points,
                aug_local.gt_points, batch.gt_labels, aug_local.gt_valid,
                aug_local.pseudo_boxes, aug_local.pseudo_valid & batch.gt_valid,
                cfg.dense,
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

        origin_cache, refined_cache, cached, _ = _point_update(
            state, batch, origin, refined_full, gate, cfg, metrics_out
        )

        new_state = state.replace(
            step=state.step + 1,
            params=params,
            teacher_params=teacher_params,
            opt_state=opt_state,
            origin_points=origin_cache,
            refined_points=refined_cache,
            points_cached=cached,
            rng=rng,
        )
        return new_state, metrics_out

    return step_fn


def build_train_step_scan(model: StudentFCOS, tx, cfg: PointTeacherConfig,
                          donate: bool = True):
    """k sequential train steps in ONE compiled program (lax.scan over a
    stacked batch pytree with leading axis k).

    Semantically identical to k calls of build_train_step's function — the
    scan chains the state carry exactly as the python loop would. The point
    is dispatch amortisation: one host->device program launch per k steps
    (the remote-tunnel round trip is ~30 ms, which at small batch sizes
    otherwise dominates the step). Returns step(state, batches, phase1) ->
    (state, metrics stacked [k])."""
    inner = _make_step_fn(model, tx, cfg)

    def multi(state: TrainState, batches: Batch, phase1: bool):
        return jax.lax.scan(lambda s, b: inner(s, b, phase1), state, batches)

    return jax.jit(multi, static_argnames=("phase1",),
                   donate_argnums=(0,) if donate else ())
