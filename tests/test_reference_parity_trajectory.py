"""FULL-STEP trajectory differential: the reference's TS_P2B_FCOS
`forward_train` run N steps IN PLACE (real ResNet-50 + FPN + PSAGG +
TS_P2BFCOSHead + RoIAlign MIL, loaded from /root/reference via
tests/_ref_stubs.load_full_detector) against our train/steps.py on identical
tiny data, comparing the loss-scalar TRAJECTORIES across the phase-1 ->
phase-2 switch (fcos_p2b_teacher_student.py:116-252).

Both sides share: ported initial weights (utils/torch_port.py), centre
points (_point_=0 is deterministic, data_augument_bank.py:1471-1494),
plain SGD (no momentum/wd/clip) with the reference's frozen-stage rules,
EMA teacher initialised equal to the student. The three stochastic inputs
are pinned to the SAME deterministic laws on both sides (monkeypatched):
strong augmentation -> identity view, the black-paper synthetic generator
-> GT boxes shifted (+6, +4) px painted white, negative proposals -> a
fixed 12x12 grid. Everything else — teacher pseudo-box generation, Topk /
FUSETopk assignment, MIL bag build + RoIAlign + towers + DN-DIoU + gfocal,
the dense losses, update_points, the optimizer step and the multi-step
teacher-student feedback — runs both implementations' REAL code.
"""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

import _ref_stubs

B, G, IMG, NCLS = 2, 3, 64, 8
N_STEPS = 6
BURN_IN = 2  # steps 0..2 phase 1, 3..5 phase 2 (count <= burn_in rule)
LR = 0.005
EMA = 0.9


def _syn_boxes_np(gt):  # [*, G, 4] -> deterministic synthetic boxes
    out = gt.copy()
    out[..., 0::2] = np.clip(out[..., 0::2] + 6.0, 0, IMG - 1)
    out[..., 1::2] = np.clip(out[..., 1::2] + 4.0, 0, IMG - 1)
    return out


def _paint_np(img_hw3, boxes):  # paint white rects (channel-last)
    out = img_hw3.copy()
    for b in boxes:
        x1, y1, x2, y2 = [int(round(v)) for v in b]
        out[y1:y2 + 1, x1:x2 + 1, :] = 255.0
    return out


def _neg_boxes_np(num, img_hw):
    h, w = img_hw
    out = np.zeros((num, 4), np.float32)
    for i in range(num):
        x = 2 + (i * 17) % max(w - 16, 1)
        y = 2 + (i * 11) % max(h - 16, 1)
        out[i] = [x, y, x + 12, y + 12]
    return out


@pytest.fixture(scope="module")
def data():
    r = np.random.RandomState(7)
    img = r.uniform(0, 255, (B, IMG, IMG, 3)).astype(np.float32)
    cxy = r.uniform(16, IMG - 16, (B, G, 2))
    wh = r.uniform(8, 18, (B, G, 2))
    boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1).astype(np.float32)
    labels = r.randint(0, NCLS, (B, G)).astype(np.int64)
    return img, boxes, labels


def _ref_model_cfg():
    return dict(
        type="Student_FCOS",
        backbone=dict(type="ResNet", depth=50, num_stages=4,
                      out_indices=(0, 1, 2, 3), frozen_stages=1,
                      norm_cfg=dict(type="BN", requires_grad=False),
                      norm_eval=True, style="caffe"),
        neck=dict(type="FPN", in_channels=[256, 512, 1024, 2048],
                  out_channels=256, start_level=1,
                  add_extra_convs="on_output", num_outs=5,
                  relu_before_extra_convs=True),
        neck_agg=dict(type="PSAGG", num_aggregation=5, in_channels=256,
                      out_channels=256),
        bbox_head=dict(
            type="TS_P2BFCOSHead", norm_cfg=None, num_classes=NCLS,
            in_channels=256, stacked_convs=4, mil_stack_conv=0,
            feat_channels=256, strides=[8], norm_on_bbox=True,
            centerness_on_reg=True, dcn_on_last_conv=False,
            center_sampling=True, conv_bias=True, beta=0.25, top_k=1,
            num_stages=1,
            bbox_roi_extractor=dict(
                type="SingleRoIExtractor",
                roi_layer=dict(type="RoIAlign", output_size=7),
                out_channels=256, featmap_strides=[8]),
            loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                          alpha=0.25, loss_weight=1.0),
            loss_bbox_burn1=dict(type="DIoULoss", loss_weight=1.0),
            loss_bbox_burn2=dict(type="DN_DIoULoss", loss_weight=1.0, hyper=0.1),
            loss_bbox_denosing=dict(type="DN_DIoULoss", loss_weight=1.0, hyper=0.2),
            loss_centerness=dict(type="CrossEntropyLoss", use_sigmoid=True,
                                 loss_weight=1.0)))


def _ref_train_cfg():
    return dict(
        assigner=dict(type="TopkAssigner", num_pre=1, topk=1,
                      cls_cost=dict(type="FocalLossCost", weight=1.0),
                      reg_cost=dict(type="PointCost", mode="L1", weight=1.0)),
        pseudo_assigner=dict(type="TopkAssigner", num_pre=3, topk=3,
                             cls_cost=dict(type="FocalLossCost", weight=0.0),
                             reg_cost=dict(type="PointCost", mode="L1", weight=1.0)),
        syn_assigner=dict(type="TopkAssigner", num_pre=3, topk=3,
                          cls_cost=dict(type="FocalLossCost", weight=0.0),
                          reg_cost=dict(type="PointCost", mode="L1", weight=1.0)),
        fuse_assigner=dict(type="FUSETopkAssigner", num_pre=5, topk=3,
                           cls_cost=dict(type="FocalLossCost", weight=1.0),
                           reg_cost=dict(type="PointCost", mode="L1", weight=1.0),
                           location_cost=dict(type="InsiderCost", weight=1.0)),
        fine_proposal_cfg=[dict(gen_mode="refine", gen_proposal_mode="fix_gen",
                                cut_mode=None, shake_ratio=None,
                                base_ratios=[1.0], min_scale=0,
                                pos_iou_thr=0.3, neg_iou_thr=0.3,
                                gen_num_neg=8)],
        fine_proposal_extensive_cfg=[dict(gen_mode="refine",
                                          gen_proposal_mode="fix_gen",
                                          cut_mode=None, shake_ratio=None,
                                          base_ratios=[1.0, 1.2, 0.8],
                                          min_scale=4, pos_iou_thr=0.3,
                                          neg_iou_thr=0.3, gen_num_neg=0)])


def _build_reference():
    full = _ref_stubs.load_full_detector()
    torch.manual_seed(0)
    ts = full.build_detector(
        dict(type="TS_P2B_FCOS", _model_=_ref_model_cfg(), _point_=0.0,
             num_stages=1, ema_alpha=EMA, filter_score=0.0,
             burn_in_step=BURN_IN, lamda=1.0, alpha=[0.01, 0.25],
             num_training_burninstep1=G, num_training_burninstep2=G),
        _ref_train_cfg(), None)
    # teacher starts equal to the student (our create_train_state law)
    ts.teacher.load_state_dict(ts.student.state_dict())
    ts.train()
    for m in (ts.teacher, ts.student):
        m.backbone.train()  # applies norm_eval + _freeze_stages
    return ts


def _run_reference(ts, data):
    """Neutralize randomness on the built reference detector, run N steps."""
    det_mod = sys.modules["refhbb.models.detectors.fcos_p2b_teacher_student"]
    img_np, gt_np, lab_np = data

    # --- deterministic patches (module-level names the detector captured) ---
    def fixed_strong_aug(img, gt_points, gt_labels, pseudo_points,
                         pseudo_labels, pseudo_bboxes):
        img_list = [img[i] for i in range(img.shape[0])]
        return (img, img_list, gt_points, gt_labels, pseudo_points,
                pseudo_labels, pseudo_bboxes)

    def fixed_neg(points_list, fine_cfg, proposals_list, img_meta):
        num = fine_cfg["gen_num_neg"]
        neg = torch.from_numpy(_neg_boxes_np(num, (IMG, IMG)))
        out, w = [], []
        for props in proposals_list:
            iou = _ref_stubs._state["ns"].iou2d.bbox_overlaps(neg, props)
            w.append((iou.max(dim=1).values < 0.3).float())
            out.append(neg.clone())
        return out, w

    def fixed_syn(num_img, img_list, gt_bboxes, gt_labels):
        img_sys, bb_sys = [], []
        for i in range(num_img):
            boxes = _syn_boxes_np(gt_bboxes[i].detach().numpy())
            img_hw3 = img_list[i].permute(1, 2, 0).numpy()
            img_sys.append(torch.from_numpy(
                _paint_np(img_hw3, boxes)).permute(2, 0, 1))
            bb_sys.append(torch.from_numpy(boxes))
        return torch.stack(img_sys, 0), img_sys, bb_sys

    saved = (det_mod.strong_augmentation, det_mod.gen_negative_proposals)
    det_mod.strong_augmentation = fixed_strong_aug
    det_mod.gen_negative_proposals = fixed_neg
    ts.genrate_syn = fixed_syn

    img = torch.from_numpy(img_np).permute(0, 3, 1, 2).contiguous()
    metas = [dict(ori_filename=f"im{i}", img_shape=(IMG, IMG, 3),
                  pad_shape=(IMG, IMG, 3), scale_factor=1.0)
             for i in range(B)]
    gt_bboxes = [torch.from_numpy(gt_np[i]) for i in range(B)]
    gt_labels = [torch.from_numpy(lab_np[i]) for i in range(B)]

    trainable = [p for p in ts.student.parameters() if p.requires_grad]
    traj = []
    try:
        for _ in range(N_STEPS):
            losses = ts.forward_train(img.clone(), metas,
                                      [b.clone() for b in gt_bboxes],
                                      [l.clone() for l in gt_labels])
            total = sum(v for k, v in losses.items()
                        if "loss" in k and v.requires_grad)
            for p in trainable:
                p.grad = None
            total.backward()
            with torch.no_grad():
                for p in trainable:
                    if p.grad is not None:
                        p -= LR * p.grad
            traj.append({k: float(v) for k, v in losses.items()})
    finally:
        det_mod.strong_augmentation, det_mod.gen_negative_proposals = saved
    return traj


def _run_ours(data, ref_student_sd):
    import point_teacher_tpu.train.mil as mil_mod
    import point_teacher_tpu.train.steps as steps_mod
    from point_teacher_tpu.core.proposals import FineProposalCfg
    from point_teacher_tpu.models.detector import StudentFCOS
    from point_teacher_tpu.train.config import OptimCfg, PointTeacherConfig
    from point_teacher_tpu.train.optim import make_optimizer
    from point_teacher_tpu.train.state import Batch, create_train_state
    from point_teacher_tpu.train.steps import build_train_step
    from point_teacher_tpu.utils.torch_port import (
        _merge_into, torch_fcos_head_to_flax, torch_fpn_to_flax,
        torch_mil_to_flax, torch_psagg_to_flax, torch_resnet50_to_flax)

    img_np, gt_np, lab_np = data
    cfg = PointTeacherConfig(
        num_classes=NCLS, img_size=IMG, max_gt=G, batch_size=B,
        burn_in_step=BURN_IN, ema_alpha=EMA, lamda=1.0, position=0.0,
        filter_score=0.0, num_stages=1, top_k=1, beta=0.25,
        alpha=(0.01, 0.25), num_training_burninstep1=G,
        num_training_burninstep2=G, dn_hyper_denoising=0.2,
        fine_proposal_cfg=(FineProposalCfg(base_ratios=(1.0,),
                                           shake_ratio=None, min_scale=0.0,
                                           gen_num_neg=8),),
        fine_proposal_extensive_cfg=(FineProposalCfg(
            base_ratios=(1.0, 1.2, 0.8), shake_ratio=None, min_scale=4.0),),
        optim=OptimCfg(base_lr=LR, momentum=0.0, weight_decay=0.0,
                       bias_lr_mult=1.0, grad_clip_norm=1e9,
                       warmup_iters=0, warmup_ratio=1.0,
                       iters_per_epoch=10 ** 9, frozen_stages=1),
    )

    model = StudentFCOS(num_classes=NCLS, frozen_stages=1, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, IMG, IMG, 3)), jnp.zeros((1, 7, 7, 256)),
                        method=StudentFCOS.init_all)
    tree = jax.tree_util.tree_map(np.asarray, params)
    sd = {k: v for k, v in ref_student_sd.items()}
    bb = {k[len("backbone."):]: v for k, v in sd.items()
          if k.startswith("backbone.")}
    _merge_into(tree["params"]["backbone"], torch_resnet50_to_flax(bb))
    _merge_into(tree["params"]["neck"], torch_fpn_to_flax(
        {k[len("neck."):]: v for k, v in sd.items() if k.startswith("neck.")}))
    _merge_into(tree["params"]["neck_agg"], torch_psagg_to_flax(
        {k[len("neck_agg."):]: v for k, v in sd.items()
         if k.startswith("neck_agg.")}))
    head_sd = {k[len("bbox_head."):]: v for k, v in sd.items()
               if k.startswith("bbox_head.")}
    _merge_into(tree["params"]["bbox_head"], torch_fcos_head_to_flax(head_sd))
    _merge_into(tree["params"]["mil_head"], torch_mil_to_flax(head_sd))
    params = jax.tree_util.tree_map(jnp.asarray, tree)

    # --- deterministic patches mirroring the reference side ---
    def fixed_syn_batch(key, images, gt_boxes, gt_valid, syn_cfg,
                        fill_value=255.0):
        # traceable mirror of the torch-side fixed_syn: boxes shifted
        # (+6, +4) and clipped (unrounded, fed to the loss), painted white
        # over the int(round())-inclusive rect (the numpy slice law)
        bsz, g = gt_boxes.shape[:2]
        boxes = gt_boxes.at[..., 0::2].add(6.0).at[..., 1::2].add(4.0)
        boxes = jnp.clip(boxes, 0.0, IMG - 1.0)
        rb_ = jnp.round(boxes)
        iy = jnp.arange(IMG, dtype=jnp.float32)[None, None, :, None]
        ix = jnp.arange(IMG, dtype=jnp.float32)[None, None, None, :]
        mask = ((ix >= rb_[..., 0][..., None, None])
                & (ix <= rb_[..., 2][..., None, None])
                & (iy >= rb_[..., 1][..., None, None])
                & (iy <= rb_[..., 3][..., None, None]))  # [B, G, H, W]
        mask = mask.any(axis=1)  # [B, H, W]
        imgs = jnp.where(mask[..., None], 255.0, images)
        slots = g + 4
        syn = jnp.zeros((bsz, slots, 4), jnp.float32).at[:, :g].set(boxes)
        valid = jnp.zeros((bsz, slots), bool).at[:, :g].set(True)
        rb5 = jnp.zeros((bsz, slots, 5), jnp.float32)
        return imgs, syn, rb5, valid

    def fixed_aug(key, batch):
        return batch

    def fixed_neg_ours(key, pos_proposals, pos_valid, num_neg, img_hw):
        from point_teacher_tpu.ops.boxes import bbox_overlaps
        neg = jnp.asarray(_neg_boxes_np(num_neg, img_hw))
        props = pos_proposals.reshape(-1, 4)
        iou = bbox_overlaps(neg, props)  # [num_neg, P]
        iou = jnp.where(pos_valid.reshape(-1)[None, :], iou, 0.0)
        return neg, iou.max(-1) < 0.3

    saved = (steps_mod.generate_black_paper_batch, steps_mod.strong_augment,
             mil_mod.negative_proposals)
    steps_mod.generate_black_paper_batch = fixed_syn_batch
    steps_mod.strong_augment = fixed_aug
    mil_mod.negative_proposals = fixed_neg_ours
    try:
        tx = make_optimizer(params, cfg.optim)
        state = create_train_state(params, tx, num_images=B, max_gt=G,
                                   rng=jax.random.PRNGKey(1))
        step = build_train_step(model, tx, cfg)
        batch = Batch(image=jnp.asarray(img_np), gt_boxes=jnp.asarray(gt_np),
                      gt_labels=jnp.asarray(lab_np.astype(np.int32)),
                      gt_valid=jnp.ones((B, G), bool),
                      image_ids=jnp.arange(B, dtype=jnp.int32))
        traj = []
        for i in range(N_STEPS):
            state, metrics = step(state, batch, phase1=(i <= BURN_IN))
            traj.append({k: float(v) for k, v in metrics.items()})
    finally:
        (steps_mod.generate_black_paper_batch, steps_mod.strong_augment,
         mil_mod.negative_proposals) = saved
    return traj


def test_forward_train_trajectory_matches_reference(data):
    ts = _build_reference()
    # the reference mutates weights in place: snapshot BEFORE running
    sd0 = {k: v.detach().clone() for k, v in ts.student.state_dict().items()}
    ref_traj = _run_reference(ts, data)
    ours_traj = _run_ours(data, sd0)
    _compare(ref_traj, ours_traj)


def _compare(ref_traj, ours_traj):
    keys = [("loss_cls", "loss_cls"), ("loss_bbox", "loss_bbox"),
            ("loss_centerness", "loss_centerness"),
            ("stage0_loss_mil_bbox", "stage0_loss_mil_bbox"),
            ("stage0_loss_mil_bags", "stage0_loss_mil_bags"),
            ("coarse_bboxes_iou", "coarse_bboxes_iou")]
    print()
    bad = []
    for i, (r, o) in enumerate(zip(ref_traj, ours_traj)):
        phase = "p1" if i <= BURN_IN else "p2"
        for rk, ok in keys:
            rv, ov = r.get(rk), o.get(ok)
            if rv is None or ov is None:
                continue
            tol = 0.02 + 0.02 * i  # fp divergence compounds across steps
            ok_match = abs(rv - ov) <= tol * max(1.0, abs(rv))
            print(f"step {i} [{phase}] {rk}: ref={rv:.5f} ours={ov:.5f}"
                  f"{'' if ok_match else '   <-- MISMATCH'}")
            if not ok_match:
                bad.append((i, rk, rv, ov))
    assert not bad, bad
