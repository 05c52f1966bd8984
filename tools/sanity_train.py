"""Closed-loop learning check: train on fabricated images with VISIBLE
objects (bright class-coded rectangles on noise) and verify AP rises.

Status notes (2026-08-17, r2): the box-supervised trainer reaches AP@.25 =
0.97 in 800 from-scratch steps at 256px on TPU with --frozen-stages 0 (a
frozen RANDOM stem blocks from-scratch learning; real configs freeze a
PRETRAINED stem). The full teacher-student loop (--trainer point_teacher,
3000 steps / 256px / burn-in 600, from scratch, points only) reaches
**teacher AP@.25 = 0.94-1.0 and holds it through 2400 phase-2 steps** with
ema_alpha=0.99. The round-1 "phase-2 collapse" is RESOLVED: it was the
harness's fast teacher EMA (0.9 ~ a 10-step horizon) — after the phase
switch the bbox supervision flips from synthetic boxes to teacher pseudo
boxes, the student transient corrupts a fast-tracking teacher, and the
pseudo-box feedback spirals (AP 0.86 -> 0.01 by step 1500, self-recovering
to 0.53 by 3000). With ema 0.99 the transient is low-pass-filtered and the
loop is stable even from scratch; the reference's 0.999 (+pretrained
backbone, burn-in ~7%% of training) sits further inside the stable region.
Regression gate:
  python tools/sanity_train.py --trainer point_teacher --steps 3000 \
    --img 256 --frozen-stages 0 --burn-in-frac 0.2 --eval-interval 300 \
    --assert-no-collapse

Validates the whole learning stack — model, targets, losses, optimizer,
teacher EMA, inference, evaluator — without any dataset on disk. Run:

  python tools/sanity_train.py --cpu --steps 60            # fcos baseline
  python tools/sanity_train.py --trainer point_teacher ...  # full TS loop
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_visible_batch(rng, b, size, g, num_classes, objects="fill"):
    """Objects = rectangles with class-coded intensity.

    Pixel range ~[0, 2]: training from random init with identity FrozenBN
    needs normalised inputs (the real configs rely on pretrained caffe
    weights to absorb raw 0-255 pixels).

    objects="fill": uniformly filled (the r1-r4 harness). PATHOLOGY (r5
    collapse root-cause, NOTES_r5): on a uniform fill, a slightly-smaller
    crop is a strictly "purer" class sample than the tight box (whose border
    bins mix in background), so MIL bag selection and the teacher's
    score-weighted box averaging systematically prefer smaller members; the
    TS feedback loop compounds the bias ~0.5%/step into monotone pseudo-box
    contraction and phase-2 teacher-AP decay. Real photographs are
    boundary-discriminative, where a tighter-than-object crop LOSES the
    object boundary — "ring" reproduces that property.

    objects="ring": full-intensity 3px boundary + 65%-intensity interior —
    the tight box is the best-scoring crop, as for real objects."""
    img = rng.uniform(0, 0.3, (b, size, size, 3)).astype(np.float32)
    boxes = np.zeros((b, g, 4), np.float32)
    labels = np.zeros((b, g), np.int32)
    for bi in range(b):
        for gi in range(g):
            w, h = rng.randint(8, 20, 2)
            x = rng.randint(4, size - w - 4)
            y = rng.randint(4, size - h - 4)
            c = rng.randint(0, num_classes)
            val = 1.0 + (c + 1) / num_classes
            for ch, v in ((c % 3, val), ((c + 1) % 3, 2.0 - val)):
                if objects == "ring":
                    img[bi, y:y + h, x:x + w, ch] = 0.65 * v
                    img[bi, y:y + 3, x:x + w, ch] = v
                    img[bi, y + h - 3:y + h, x:x + w, ch] = v
                    img[bi, y:y + h, x:x + 3, ch] = v
                    img[bi, y:y + h, x + w - 3:x + w, ch] = v
                else:
                    img[bi, y:y + h, x:x + w, ch] = v
            boxes[bi, gi] = [x, y, x + w, y + h]
            labels[bi, gi] = c
    return img, boxes, labels


def make_visible_rbatch(rng, b, size, g, num_classes, objects="fill"):
    """Rotated variant of make_visible_batch: class-coded rotated rectangles
    (cv2.fillPoly) on noise; returns (img, rboxes [B,G,5], labels).
    objects="ring" draws a full-intensity 3px boundary + 65% interior — see
    make_visible_batch for the uniform-fill shrink pathology it avoids."""
    import cv2

    img = rng.uniform(0, 0.3, (b, size, size, 3)).astype(np.float32)
    rboxes = np.zeros((b, g, 5), np.float32)
    labels = np.zeros((b, g), np.int32)
    for bi in range(b):
        for gi in range(g):
            w, h = rng.randint(10, 24, 2)
            a = rng.uniform(-np.pi / 2, np.pi / 2)
            cx = rng.randint(20, size - 20)
            cy = rng.randint(20, size - 20)
            c = rng.randint(0, num_classes)
            val = 1.0 + (c + 1) / num_classes
            pts = cv2.boxPoints(((float(cx), float(cy)), (float(w), float(h)),
                                 float(np.degrees(a)))).astype(np.int32)
            mask = np.zeros((size, size), np.uint8)
            cv2.fillPoly(mask, [pts], 1)
            m = mask.astype(bool)
            if objects == "ring":
                ring = np.zeros((size, size), np.uint8)
                cv2.polylines(ring, [pts], isClosed=True, color=1, thickness=3)
                rm = ring.astype(bool)
                for ch, v in ((c % 3, val), ((c + 1) % 3, 2.0 - val)):
                    img[bi, :, :, ch][m] = 0.65 * v
                    img[bi, :, :, ch][rm] = v
            else:
                img[bi, :, :, c % 3][m] = val
                img[bi, :, :, (c + 1) % 3][m] = 2.0 - val
            rboxes[bi, gi] = [cx, cy, w, h, a]
            labels[bi, gi] = c
    return img, rboxes, labels


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--img", type=int, default=128)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--gt", type=int, default=4)
    ap.add_argument("--classes", type=int, default=3)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--trainer", default="fcos",
                    choices=["fcos", "point_teacher", "rotated"])
    ap.add_argument("--frozen-stages", type=int, default=1)
    # TS-loop stability knobs (collapse-mode sweeps)
    ap.add_argument("--ema-alpha", type=float, default=0.99,
                    help="teacher EMA. 0.99 default: the r2 sweep showed "
                         "0.9 collapses after the phase switch (teacher "
                         "tracks the noisy student too fast -> pseudo-box "
                         "spiral, AP 0.86->0.01->recovers 0.53) while 0.99 "
                         "is stable at AP~1.0; reference uses 0.999")
    ap.add_argument("--filter-score", type=float, default=0.0)
    ap.add_argument("--lamda", type=float, default=1.0)
    ap.add_argument("--position", type=float, default=0.0,
                    help="_point_: central fraction for annotation-point "
                         "sampling (0=center, 1=anywhere in the box — the "
                         "noise-robustness configs use 0.3/0.6/1.0 with "
                         "lamda=0.5)")
    ap.add_argument("--burn-in-frac", type=float, default=0.7,
                    help="burn_in_step = frac * steps")
    ap.add_argument("--eval-interval", type=int, default=0,
                    help="evaluate teacher/student AP every N steps (AP "
                         "trajectory for collapse diagnosis)")
    ap.add_argument("--assert-no-collapse", action="store_true",
                    help="exit nonzero if the final teacher AP drops below "
                         "--collapse-ratio of its post-burn-in peak (the TS "
                         "self-distillation collapse regression; needs "
                         "--eval-interval)")
    ap.add_argument("--collapse-ratio", type=float, default=0.7,
                    help="collapse gate: final teacher AP must stay above "
                         "ratio * phase-2 peak. r4 ran at 0.5, which blessed "
                         "a 32%% HBB decay; with the lr schedule on "
                         "(--lr-epochs) both trainers hold well above 0.7")
    ap.add_argument("--lr-epochs", type=int, default=12,
                    help="divide the run into N epochs for the reference's "
                         "step-lr schedule (x0.1 at epochs 8 and 11 of 12 — "
                         "aitodv2_point_teacher_0%%.py lr_config). 0 = "
                         "constant lr for the whole run (the pre-r5 harness "
                         "behaviour, which lets phase-2 self-distillation "
                         "drift unannealed — artifacts/r4_campaign/)")
    ap.add_argument("--pool-grouped", type=int, default=1, choices=[0, 1],
                    help="0 = exact per-roi MIL pooling (mil_pool_grouped="
                         "False), for causality A/Bs on the grouped-window "
                         "approximation")
    ap.add_argument("--ablate-aug", action="store_true",
                    help="replace the strong augmentation with the identity "
                         "view (decay-causality A/B: if the phase-2 teacher "
                         "drift vanishes, the aug warp<->coordinate-law "
                         "mapping is injecting a per-step bias)")
    ap.add_argument("--objects", default="fill", choices=["fill", "ring"],
                    help="fabricated-object texture. fill = uniform rectangles "
                         "(r1-r4 harness; carries an interior-crop selection "
                         "bias that drives phase-2 pseudo-box contraction — "
                         "NOTES_r5 root-cause). ring = discriminative 2px "
                         "boundary + faint interior, the real-photo regime")
    ap.add_argument("--top-k", type=int, default=1,
                    help="MIL selection top-k (reference SODA-A config: 3 — "
                         "averaging damps the selection walk; HBB config: 1)")
    ap.add_argument("--gen-neg", type=int, default=16,
                    help="negative proposals per image (reference: 200). "
                         "Negatives train the bag classifier to score "
                         "background-containing and far-off-scale crops low "
                         "— they SHAPE the scoring basin that anchors the "
                         "phase-2 pseudo-box walk; the harness default 16 "
                         "was a speed cut that weakens the anchor")
    ap.add_argument("--ext-ratios", default="1.0,1.2,0.8",
                    help="extensive-bag base_ratios (comma list). A/B knob "
                         "for the shrink bias: ratios >= 1.0 only removes "
                         "the smaller-than-pseudo members from selection")
    ap.add_argument("--metrics-out", default=None,
                    help="write one JSON line per --log-interval step (and "
                         "per eval) with the full metrics dict for offline "
                         "trajectory analysis")
    ap.add_argument("--log-interval", type=int, default=20)
    args = ap.parse_args()
    import jax

    # persistent compile cache: campaign phases re-run after tunnel outages
    # re-use their programs instead of paying the many-minute remote compile
    _cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                          ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from point_teacher_tpu.core.proposals import FineProposalCfg
    from point_teacher_tpu.evalx.cocoeval import COCOStyleEval
    from point_teacher_tpu.inference import build_inference_fn
    from point_teacher_tpu.models.detector import StudentFCOS
    from point_teacher_tpu.train.config import InferenceCfg, PointTeacherConfig
    from point_teacher_tpu.train.fcos_baseline import build_fcos_train_step
    from point_teacher_tpu.train.optim import make_optimizer
    from point_teacher_tpu.train.state import Batch, create_train_state
    from point_teacher_tpu.train.steps import build_train_step

    cfg = PointTeacherConfig(
        num_classes=args.classes, img_size=args.img, max_gt=args.gt,
        batch_size=args.batch, burn_in_step=int(args.steps * args.burn_in_frac),
        # harness scale: a fast-tracking teacher (the reference's 0.999 needs
        # tens of thousands of steps to transfer student progress)
        ema_alpha=args.ema_alpha,
        filter_score=args.filter_score,
        lamda=args.lamda,
        position=args.position,
        num_training_burninstep1=args.gt, num_training_burninstep2=args.gt,
        top_k=args.top_k,
        fine_proposal_cfg=(FineProposalCfg(base_ratios=(1.0,), min_scale=0.0,
                                           gen_num_neg=args.gen_neg),),
        fine_proposal_extensive_cfg=(FineProposalCfg(
            base_ratios=tuple(float(r) for r in args.ext_ratios.split(",")),
            min_scale=4.0),),
        syn_fill_value=2.0,  # match the harness's normalised pixel range
        mil_pool_grouped=bool(args.pool_grouped),
        optim=PointTeacherConfig().optim._replace(
            base_lr=args.lr, warmup_iters=10, warmup_ratio=1.0,
            frozen_stages=args.frozen_stages,
            # reference-proportioned step-lr schedule (x0.1 at epochs 8, 11
            # of --lr-epochs); 0 disables it (constant lr)
            iters_per_epoch=(max(1, args.steps // args.lr_epochs)
                             if args.lr_epochs else 10 ** 9)),
    )
    rotated = args.trainer == "rotated"
    if args.ablate_aug:
        import point_teacher_tpu.train.rsteps as _rsteps_mod
        import point_teacher_tpu.train.steps as _steps_mod

        _steps_mod.strong_augment = lambda k, b: b
        _rsteps_mod.strong_augment_rotated = lambda k, b: b
    if args.objects == "ring":
        # Ring-real objects need ring-SYNTHETIC objects: the reference's
        # black-paper branch paints solid rects (fill_value), so with ring
        # data the box-regression head would train exclusively on uniform
        # fills and never transfer to the ring-structured real objects
        # within the harness's short from-scratch burn-in — both r5 blind
        # ring TS runs died in phase 1 with AP~0 garbage pseudo boxes
        # (m_rot_ring.jsonl). Harness-side wrapper only; the library
        # generator stays reference-faithful (solid fill).
        import point_teacher_tpu.train.rsteps as _rsteps_mod2
        import point_teacher_tpu.train.steps as _steps_mod2
        from point_teacher_tpu.core.synthetic import (
            generate_black_paper_batch as _gbp)
        from point_teacher_tpu.ops.masks import rasterize_rboxes as _rast

        def ring_gbp(key, images, gts, valid, cfg, fill_value=255.0):
            import jax as _jax
            import jax.numpy as _jnp

            img_syn, xyxy, rb, v = _gbp(key, images, gts, valid, cfg,
                                        fill_value=fill_value)
            h_, w_ = images.shape[1], images.shape[2]
            inner = rb.at[..., 2:4].set(_jnp.maximum(rb[..., 2:4] - 6.0, 0.0))
            imask = _jax.vmap(lambda bb, vv: _rast(bb, vv, h_, w_))(inner, v)
            return (_jnp.where(imask[..., None],
                               _jnp.asarray(0.65 * fill_value, img_syn.dtype),
                               img_syn), xyxy, rb, v)

        _steps_mod2.generate_black_paper_batch = ring_gbp
        _rsteps_mod2.generate_black_paper_batch = ring_gbp
    rng = jax.random.PRNGKey(0)
    if rotated:
        from point_teacher_tpu.evalx.rgeometry import rbox_iou_np
        from point_teacher_tpu.inference import build_rotated_inference_fn
        from point_teacher_tpu.models.rotated_detector import StudentRotatedFCOS
        from point_teacher_tpu.train.rsteps import build_rotated_train_step

        model = StudentRotatedFCOS(num_classes=cfg.num_classes,
                                   num_stages=cfg.num_stages,
                                   frozen_stages=args.frozen_stages,
                                   dtype=jnp.float32)
        params = model.init(rng, jnp.zeros((1, args.img, args.img, 3)),
                            jnp.zeros((1, 7, 7, 256)),
                            method=StudentRotatedFCOS.init_all)
        tx = make_optimizer(params, cfg.optim)
        state = create_train_state(params, tx, num_images=64, max_gt=args.gt, rng=rng)
        step = build_rotated_train_step(model, tx, cfg)
        infer = build_rotated_inference_fn(
            model, InferenceCfg(nms_pre=256, score_thr=0.05, nms_iou=0.1,
                                max_per_img=64), args.img)
        from functools import partial
        make_batch = partial(make_visible_rbatch, objects=args.objects)
        box_dim = 5
        eval_kw = dict(iou_fn=rbox_iou_np,
                       area_fn=lambda b: (b[:, 2] * b[:, 3] if len(b)
                                          else np.zeros(0)))
    else:
        model = StudentFCOS(num_classes=cfg.num_classes,
                            frozen_stages=args.frozen_stages, dtype=jnp.float32)
        params = model.init(rng, jnp.zeros((1, args.img, args.img, 3)),
                            jnp.zeros((1, 7, 7, 256)), method=StudentFCOS.init_all)
        tx = make_optimizer(params, cfg.optim)
        state = create_train_state(params, tx, num_images=64, max_gt=args.gt, rng=rng)
        if args.trainer == "fcos":
            fstep = build_fcos_train_step(model, tx, cfg)
            step = lambda s, b, phase1: fstep(s, b)  # noqa: E731
        else:
            step = build_train_step(model, tx, cfg)
        infer = build_inference_fn(
            model, InferenceCfg(nms_pre=256, score_thr=0.05, nms_iou=0.5,
                                max_per_img=64), args.img)
        from functools import partial
        make_batch = partial(make_visible_batch, objects=args.objects)
        box_dim = 4
        eval_kw = {}

    def evaluate(p, n_batches=4):
        r = np.random.RandomState(999)
        gts, dets = [], []
        for _ in range(n_batches):
            img, boxes, labels = make_batch(r, args.batch, args.img,
                                            args.gt, args.classes)
            d, l, v = infer(p, jnp.asarray(img), jnp.ones((args.batch, 4)))
            d, l, v = np.asarray(d), np.asarray(l), np.asarray(v)
            for bi in range(args.batch):
                gts.append(dict(boxes=boxes[bi], labels=labels[bi].astype(np.int64)))
                dets.append((d[bi, v[bi], :box_dim], d[bi, v[bi], box_dim],
                             l[bi, v[bi]]))
        gt = dict(img_ids=list(range(len(gts))),
                  classes=[f"c{i}" for i in range(args.classes)], annotations=gts)
        return COCOStyleEval(gt, dets, **eval_kw).evaluate()["mAP"]

    ap0 = evaluate(state.teacher_params if args.trainer != "fcos" else state.params)
    print(f"AP@0.25 before training: {ap0:.4f}")

    # fixed dataset cycled in epochs: the per-image point cache in TrainState
    # is keyed by image id, so ids must always map to the same image
    r = np.random.RandomState(0)
    n_data_batches = 16
    dataset = [make_batch(r, args.batch, args.img, args.gt, args.classes)
               for _ in range(n_data_batches)]
    peak_phase2_ap = -1.0
    # Grouped MIL pool window-coverage gates. Coverage is measured on the
    # DN-REFINED cls bags: at random init the regression tower emits wild
    # deltas, so refined bags land far outside the group window for the
    # first few hundred steps (r5 trajectory m_rot_lr12: min 0.396 before
    # step 600, 1.0 ever after — including through the whole teacher-AP
    # decay; the r4 loop_rot 0.444 "collapse symptom" was this same benign
    # transient, not a decay mechanism). The gate therefore runs on the
    # POST-burn-in region, where refined boxes are actually KEPT and train
    # the student (phase-1 refinement is discarded per the reference quirk,
    # fcos_p2b_teacher_student.py:187); the all-run min is still reported.
    min_pool_coverage = 1.0        # over the whole run (diagnostic)
    min_pool_coverage_p2 = 1.0     # phase 2 only (the gate)
    mfile = open(args.metrics_out, "w") if args.metrics_out else None

    def mdump(rec):
        if mfile:
            import json
            mfile.write(json.dumps(rec) + "\n")
            mfile.flush()

    for i in range(args.steps):
        bi = i % n_data_batches
        img, boxes, labels = dataset[bi]
        batch = Batch(
            image=jnp.asarray(img), gt_boxes=jnp.asarray(boxes),
            gt_labels=jnp.asarray(labels), gt_valid=jnp.ones((args.batch, args.gt), bool),
            image_ids=jnp.asarray(np.arange(args.batch) + bi * args.batch,
                                  dtype=jnp.int32),
        )
        state, metrics = step(state, batch, phase1=(i <= cfg.burn_in_step))
        for k in metrics:
            if k.endswith("cls_pool_coverage"):
                cov = float(metrics[k])
                min_pool_coverage = min(min_pool_coverage, cov)
                if i > cfg.burn_in_step:
                    min_pool_coverage_p2 = min(min_pool_coverage_p2, cov)
        # host-side replica of make_lr_schedule (trajectory analysis)
        oc = cfg.optim
        lr_now = oc.base_lr * (oc.warmup_ratio if i < oc.warmup_iters else 1.0)
        for e in oc.step_epochs:
            if i // oc.iters_per_epoch >= e:
                lr_now *= 0.1
        if i % args.log_interval == 0:
            extra = ""
            if "coarse_bboxes_iou" in metrics:
                extra = (f" coarse_iou={float(metrics['coarse_bboxes_iou']):.3f}"
                         f" pseudo_iou={float(metrics.get('pseudo_mean_iou', 0)):.3f}")
            if "pseudo_mean_wh" in metrics:
                extra += (f" pwh={float(metrics['pseudo_mean_wh']):.1f}"
                          f"/{float(metrics['pseudo_max_wh']):.0f}")
            print(f"step {i}: total={float(metrics['total_loss']):.3f} "
                  f"cls={float(metrics['loss_cls']):.3f} "
                  f"bbox={float(metrics['loss_bbox']):.3f}" + extra, flush=True)
            mdump(dict({k: float(v) for k, v in metrics.items()}, step=i,
                       kind="train", lr=lr_now))
        if args.eval_interval and i and i % args.eval_interval == 0:
            s_ap = evaluate(state.params)
            t_ap = (evaluate(state.teacher_params)
                    if args.trainer != "fcos" else s_ap)
            phase = "burn-in" if i <= cfg.burn_in_step else "phase-2"
            print(f"eval step {i} ({phase}): student AP={s_ap:.4f} "
                  f"teacher AP={t_ap:.4f}", flush=True)
            mdump(dict(step=i, kind="eval", phase=phase, student_ap=s_ap,
                       teacher_ap=t_ap))
            if i > cfg.burn_in_step:
                peak_phase2_ap = max(peak_phase2_ap, t_ap)

    student_ap = evaluate(state.params)
    print(f"AP@0.25 after {args.steps} steps (student): {student_ap:.4f}")
    if args.trainer != "fcos":
        teacher_ap = evaluate(state.teacher_params)
        print(f"AP@0.25 after {args.steps} steps (teacher): {teacher_ap:.4f}")
    ok = student_ap > ap0 + 0.02
    print("LEARNING:", "OK" if ok else "NOT IMPROVING")
    if args.trainer != "fcos":
        # grouped-pool approximation guard: the shared-window MIL pool is
        # exact only while cls_pool_coverage stays ~1.0 (train/mil.py); a
        # closed loop that drives boxes beyond the window must fail loudly
        # rather than silently train on border-clamped features.
        print(f"MIN cls_pool_coverage over run: {min_pool_coverage:.4f} "
              f"(phase-2 only: {min_pool_coverage_p2:.4f})")
    if args.assert_no_collapse and args.trainer != "fcos":
        final_t = teacher_ap
        collapsed = (peak_phase2_ap > 0.05
                     and final_t < args.collapse_ratio * peak_phase2_ap)
        print(f"COLLAPSE CHECK: peak phase-2 teacher AP={peak_phase2_ap:.4f}, "
              f"final={final_t:.4f} (gate {args.collapse_ratio:.2f}*peak) -> "
              f"{'COLLAPSED' if collapsed else 'STABLE'}")
        if collapsed:
            return 2
        if min_pool_coverage_p2 < 0.98:
            print(f"POOL COVERAGE GATE: min phase-2 cls_pool_coverage "
                  f"{min_pool_coverage_p2:.4f} < 0.98 — grouped-pool window "
                  f"assumption violated where refined boxes train the "
                  f"student (widen mil_pool_window or set "
                  f"mil_pool_grouped=False)")
            return 3
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
