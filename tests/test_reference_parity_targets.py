"""Differential parity: dense FCOS target assignment + bag/focal losses vs the
reference's OWN modules (loaded in place via tests/_ref_stubs.py).

Covers the last big untested dense-path surface: _get_target_single (syn
branch) and _get_target_pseudo_single (pseudo branch) of TS_P2BFCOSHead
(fcos_head_p2b_ts.py:570-708) vs core/targets.py, with the head constructed
under the SHIPPED aitodv2_point_teacher_0%.py train_cfg assigners; plus the
head's gfocal_loss (:1074-1078) and py_sigmoid_focal_loss
(losses/focal_loss.py:11) vs ops/losses.py.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from point_teacher_tpu.core.targets import AssignerCfg, pseudo_targets, syn_targets  # noqa: E402
from point_teacher_tpu.ops.losses import gfocal_loss, sigmoid_focal_loss  # noqa: E402

from _ref_stubs import setup  # noqa: E402

REF = setup()

NUM_CLASSES = 8

# shipped aitodv2_point_teacher_0%.py train_cfg (:101-126)
TRAIN_CFG = dict(
    assigner=dict(
        type="TopkAssigner", num_pre=1, topk=1,
        cls_cost=dict(type="FocalLossCost", weight=1.0),
        reg_cost=dict(type="PointCost", mode="L1", weight=1.0)),
    pseudo_assigner=dict(
        type="TopkAssigner", num_pre=3, topk=3,
        cls_cost=dict(type="FocalLossCost", weight=0.0),
        reg_cost=dict(type="PointCost", mode="L1", weight=1.0)),
    syn_assigner=dict(
        type="TopkAssigner", num_pre=3, topk=3,
        cls_cost=dict(type="FocalLossCost", weight=0.0),
        reg_cost=dict(type="PointCost", mode="L1", weight=1.0)),
    fuse_assigner=dict(
        type="FUSETopkAssigner", num_pre=5, topk=3,
        cls_cost=dict(type="FocalLossCost", weight=1.0),
        reg_cost=dict(type="PointCost", mode="L1", weight=1.0),
        location_cost=dict(type="InsiderCost", weight=1.0)),
)

SYN_CFG = AssignerCfg(num_pre=3, topk=3, cls_weight=0.0, reg_weight=1.0)
CLS_CFG = AssignerCfg(num_pre=1, topk=1, cls_weight=1.0, reg_weight=1.0)
PSEUDO_CFG = AssignerCfg(num_pre=3, topk=3, cls_weight=0.0, reg_weight=1.0)


@pytest.fixture(scope="module")
def torch_head():
    torch.manual_seed(0)
    return REF.fcos_head.TS_P2BFCOSHead(
        num_classes=NUM_CLASSES, in_channels=256, stacked_convs=1,
        feat_channels=32, strides=[8], norm_cfg=None, conv_bias=True,
        norm_on_bbox=True, centerness_on_reg=True, center_sampling=True,
        mil_stack_conv=0, num_stages=1, train_cfg=TRAIN_CFG,
        bbox_roi_extractor=dict(type="SingleRoIExtractor"),
    )


def _grid_points(n=20, stride=8.0):
    ys, xs = np.mgrid[0:n, 0:n].astype(np.float32)
    pts = np.stack([xs.ravel() * stride + stride / 2,
                    ys.ravel() * stride + stride / 2], -1)
    return pts  # [P, 2]


def _random_case(seed, g=7, img=160.0):
    r = np.random.RandomState(seed)
    pts = _grid_points()
    # sub-pixel jitter on the GTs de-ties the L1 stage-1 costs (the
    # reference's torch.topk tie order is unspecified on exact grids)
    cx = r.uniform(10, img - 10, g) + r.uniform(0.05, 0.31, g)
    cy = r.uniform(10, img - 10, g) + r.uniform(0.07, 0.29, g)
    bw = r.uniform(6, 40, g)
    bh = r.uniform(6, 40, g)
    boxes = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2],
                     -1).astype(np.float32)
    cls_logits = r.randn(pts.shape[0], NUM_CLASSES).astype(np.float32)
    labels = r.randint(0, NUM_CLASSES, g).astype(np.int64)
    return pts, boxes, cls_logits, labels


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_syn_targets_match_reference(torch_head, seed):
    pts, boxes, cls_logits, _ = _random_case(seed)
    with torch.no_grad():
        t_labels, t_bt = torch_head._get_target_single(
            torch.from_numpy(boxes), torch.from_numpy(cls_logits), None, None,
            points=torch.from_numpy(pts), num_points_per_lvl=[pts.shape[0]])

    j_labels, j_bt = syn_targets(
        jnp.asarray(pts), jnp.asarray(cls_logits), jnp.asarray(boxes),
        jnp.ones(boxes.shape[0], bool), NUM_CLASSES, SYN_CFG)

    np.testing.assert_array_equal(np.asarray(j_labels), t_labels.numpy())
    pos = t_labels.numpy() != NUM_CLASSES
    assert pos.any()
    # reference leaves bg rows pointing at GT row 0 — same quirk our side
    # keeps, so ALL rows must agree
    np.testing.assert_allclose(np.asarray(j_bt), t_bt.numpy(), rtol=1e-5,
                               atol=1e-4)


@pytest.mark.parametrize("seed", [3, 4])
def test_pseudo_targets_match_reference(torch_head, seed):
    pts, pseudo_boxes, cls_logits, labels = _random_case(seed)
    r = np.random.RandomState(seed + 100)
    g = pseudo_boxes.shape[0]
    gt_points = np.stack(
        [r.uniform(10, 150, g) + r.uniform(0.05, 0.3, g),
         r.uniform(10, 150, g) + r.uniform(0.05, 0.3, g)], -1).astype(np.float32)

    with torch.no_grad():
        t_lreg, t_bt, t_labels, t_w = torch_head._get_target_pseudo_single(
            torch.from_numpy(gt_points), torch.from_numpy(labels),
            torch.from_numpy(gt_points), torch.from_numpy(labels),
            torch.from_numpy(pseudo_boxes),
            torch.from_numpy(cls_logits), None, None,
            {"ori_filename": "x.png"}, None, None,
            points=torch.from_numpy(pts), num_points_per_lvl=[pts.shape[0]],
            burn_in_step1=False)

    j_labels, j_lreg, j_bt = pseudo_targets(
        jnp.asarray(pts), jnp.asarray(cls_logits), jnp.asarray(gt_points),
        jnp.asarray(labels.astype(np.int32)), jnp.ones(g, bool),
        jnp.asarray(pseudo_boxes), jnp.asarray(labels.astype(np.int32)),
        jnp.ones(g, bool), NUM_CLASSES, CLS_CFG, PSEUDO_CFG)

    np.testing.assert_array_equal(np.asarray(j_labels), t_labels.numpy())
    np.testing.assert_array_equal(np.asarray(j_lreg), t_lreg.numpy())
    np.testing.assert_allclose(np.asarray(j_bt), t_bt.numpy(), rtol=1e-5,
                               atol=1e-4)
    assert (t_w.numpy() == 1.0).all()  # reference weights are all-ones


def test_gfocal_loss_matches_reference(torch_head):
    r = np.random.RandomState(7)
    p = r.uniform(0.01, 0.99, (40, NUM_CLASSES)).astype(np.float32)
    q = (r.uniform(0, 1, (40, NUM_CLASSES)) < 0.3).astype(np.float32)
    w = r.uniform(0, 1, (40, 1)).astype(np.float32)
    with torch.no_grad():
        want = torch_head.gfocal_loss(torch.from_numpy(p), torch.from_numpy(q),
                                      torch.from_numpy(w)).numpy()
    got = np.asarray(gfocal_loss(jnp.asarray(p), jnp.asarray(q), jnp.asarray(w)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_sigmoid_focal_loss_matches_reference():
    from refhbb.models.losses.focal_loss import py_sigmoid_focal_loss

    r = np.random.RandomState(8)
    pred = r.randn(60, NUM_CLASSES).astype(np.float32)
    target = np.eye(NUM_CLASSES, dtype=np.float32)[
        r.randint(0, NUM_CLASSES, 60)]
    with torch.no_grad():
        want = py_sigmoid_focal_loss(
            torch.from_numpy(pred), torch.from_numpy(target),
            gamma=2.0, alpha=0.25, reduction="none").numpy()
    got = np.asarray(sigmoid_focal_loss(jnp.asarray(pred), jnp.asarray(target),
                                        gamma=2.0, alpha=0.25))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


# ---------------- rotated (OBB fork) ----------------

@pytest.fixture(scope="module")
def torch_rhead():
    torch.manual_seed(1)
    return REF.r_head.TS_P2RBRotatedFCOSHead(
        num_classes=9, in_channels=256, stacked_convs=1, feat_channels=32,
        strides=[8], center_sampling=True, norm_on_bbox=True,
        separate_angle=False, scale_angle=True, mil_stack_conv=0,
        num_stages=2, train_cfg=TRAIN_CFG,
        bbox_coder=dict(type="DistanceAnglePointCoder", angle_version="le90"),
        bbox_roi_extractor=dict(type="RotatedSingleRoIExtractor"),
    )


def _random_rcase(seed, g=6, img=160.0):
    r = np.random.RandomState(seed)
    pts = _grid_points()
    cx = r.uniform(10, img - 10, g) + r.uniform(0.05, 0.31, g)
    cy = r.uniform(10, img - 10, g) + r.uniform(0.07, 0.29, g)
    bw = r.uniform(6, 40, g)
    bh = r.uniform(6, 40, g)
    ang = r.uniform(-np.pi / 2, np.pi / 2, g)
    rboxes = np.stack([cx, cy, bw, bh, ang], -1).astype(np.float32)
    cls_logits = r.randn(pts.shape[0], 9).astype(np.float32)
    labels = r.randint(0, 9, g).astype(np.int64)
    return pts, rboxes, cls_logits, labels


@pytest.mark.parametrize("seed", [10, 11])
def test_rotated_syn_targets_match_reference(torch_rhead, seed):
    from point_teacher_tpu.core.rtargets import syn_targets_rotated

    pts, rboxes, cls_logits, _ = _random_rcase(seed)
    with torch.no_grad():
        t_labels, t_bt, t_ang = torch_rhead._get_target_single(
            torch.from_numpy(rboxes), torch.from_numpy(cls_logits), None, None,
            points=torch.from_numpy(pts), num_points_per_lvl=[pts.shape[0]])

    j_labels, j_bt, j_ang = syn_targets_rotated(
        jnp.asarray(pts), jnp.asarray(cls_logits), jnp.asarray(rboxes),
        jnp.ones(rboxes.shape[0], bool), 9, SYN_CFG)

    np.testing.assert_array_equal(np.asarray(j_labels), t_labels.numpy())
    np.testing.assert_allclose(np.asarray(j_bt), t_bt.numpy(), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_ang), t_ang.numpy(), rtol=1e-5,
                               atol=1e-6)


@pytest.mark.parametrize("seed", [12])
def test_rotated_pseudo_targets_match_reference(torch_rhead, seed):
    from point_teacher_tpu.core.rtargets import pseudo_targets_rotated

    pts, prboxes, cls_logits, labels = _random_rcase(seed)
    r = np.random.RandomState(seed + 50)
    g = prboxes.shape[0]
    gt_points = np.stack(
        [r.uniform(10, 150, g) + r.uniform(0.05, 0.3, g),
         r.uniform(10, 150, g) + r.uniform(0.05, 0.3, g)], -1).astype(np.float32)

    with torch.no_grad():
        t_lreg, t_bt, t_ang, t_labels, t_w = torch_rhead._get_target_pseudo_single(
            torch.from_numpy(gt_points), torch.from_numpy(labels),
            torch.from_numpy(gt_points), torch.from_numpy(labels),
            torch.from_numpy(prboxes),
            torch.from_numpy(cls_logits), None, None,
            {"ori_filename": "x.png"}, None, None,
            points=torch.from_numpy(pts), num_points_per_lvl=[pts.shape[0]],
            burn_in_step1=False)

    j_labels, j_lreg, j_bt, j_ang = pseudo_targets_rotated(
        jnp.asarray(pts), jnp.asarray(cls_logits), jnp.asarray(gt_points),
        jnp.asarray(labels.astype(np.int32)), jnp.ones(g, bool),
        jnp.asarray(prboxes), jnp.ones(g, bool), 9, CLS_CFG, PSEUDO_CFG)

    np.testing.assert_array_equal(np.asarray(j_labels), t_labels.numpy())
    np.testing.assert_array_equal(np.asarray(j_lreg), t_lreg.numpy())
    np.testing.assert_allclose(np.asarray(j_bt), t_bt.numpy(), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_ang), t_ang.numpy(), rtol=1e-5,
                               atol=1e-6)
    assert (t_w.numpy() == 1.0).all()


# ---------------- end-to-end dense losses ----------------

def _dense_preds(seed, b=2, n=20, c=NUM_CLASSES):
    r = np.random.RandomState(seed)
    cls = r.randn(b, c, n, n).astype(np.float32)
    bbox = (np.abs(r.randn(b, 4, n, n)) * 8 + 0.5).astype(np.float32)
    ctr = r.randn(b, 1, n, n).astype(np.float32)
    return cls, bbox, ctr


def _nhwc_flat(x):
    """[B, C, H, W] -> [B, H*W, C] (reference permute+reshape order)."""
    return jnp.asarray(x.transpose(0, 2, 3, 1).reshape(x.shape[0], -1, x.shape[1]))


def test_syn_branch_loss_matches_reference(torch_head):
    """head.loss (fcos_head_p2b_ts.py:470-534) vs train.dense_losses
    syn_branch_loss: DIoU weighted by centerness targets + centerness BCE,
    including num_pos / centerness_denorm normalisation."""
    from point_teacher_tpu.train.dense_losses import DenseLossCfg, syn_branch_loss

    pts = _grid_points()
    cls, bbox, ctr = _dense_preds(20)
    cases = [_random_case(s)[1] for s in (20, 21)]  # per-image gt boxes

    with torch.no_grad():
        t_bbox_loss, t_ctr_loss = torch_head.loss(
            [torch.from_numpy(cls)], [torch.from_numpy(bbox)],
            [torch.from_numpy(ctr)], [torch.from_numpy(pts)],
            [torch.from_numpy(x) for x in cases],
            [{"ori_filename": "a.png"}, {"ori_filename": "b.png"}])

    cfg = DenseLossCfg(num_classes=NUM_CLASSES)
    gb = jnp.asarray(np.stack(cases))
    j_bbox_loss, j_ctr_loss = syn_branch_loss(
        _nhwc_flat(cls), _nhwc_flat(bbox), _nhwc_flat(ctr)[..., 0],
        jnp.asarray(pts), gb, jnp.ones(gb.shape[:2], bool), cfg)

    np.testing.assert_allclose(float(j_bbox_loss), float(t_bbox_loss),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(j_ctr_loss), float(t_ctr_loss),
                               rtol=1e-5, atol=1e-6)


def test_pseudo_branch_loss_matches_reference(torch_head):
    """head.loss_pseudo (fcos_head_p2b_ts.py:380-465) vs pseudo_branch_loss:
    focal cls with all-ones weights / num_pos, DN-DIoU (hyper 0.1) with
    centerness weighting, centerness BCE."""
    from point_teacher_tpu.train.dense_losses import DenseLossCfg, pseudo_branch_loss

    pts = _grid_points()
    cls, bbox, ctr = _dense_preds(30)
    r = np.random.RandomState(31)
    gts, pbs, labs = [], [], []
    for s in (30, 31):
        _, boxes, _, labels = _random_case(s)
        g = boxes.shape[0]
        gp = np.stack([r.uniform(10, 150, g) + r.uniform(0.05, 0.3, g),
                       r.uniform(10, 150, g) + r.uniform(0.05, 0.3, g)],
                      -1).astype(np.float32)
        gts.append(gp); pbs.append(boxes); labs.append(labels)

    with torch.no_grad():
        t_cls, t_bbox, t_ctr = torch_head.loss_pseudo(
            [torch.from_numpy(cls)], [torch.from_numpy(bbox)],
            [torch.from_numpy(ctr)], [torch.from_numpy(pts)],
            [torch.from_numpy(x) for x in gts],
            [torch.from_numpy(x) for x in labs],
            [torch.from_numpy(x) for x in gts],
            [torch.from_numpy(x) for x in labs],
            [torch.from_numpy(x) for x in pbs],
            [None, None],
            [{"ori_filename": "a.png"}, {"ori_filename": "b.png"}],
            [None, None], False)

    cfg = DenseLossCfg(num_classes=NUM_CLASSES)
    j_cls, j_bbox, j_ctr = pseudo_branch_loss(
        _nhwc_flat(cls), _nhwc_flat(bbox), _nhwc_flat(ctr)[..., 0],
        jnp.asarray(pts), jnp.asarray(np.stack(gts)),
        jnp.asarray(np.stack(labs).astype(np.int32)),
        jnp.ones((2, gts[0].shape[0]), bool), jnp.asarray(np.stack(pbs)),
        jnp.ones((2, pbs[0].shape[0]), bool), cfg)

    np.testing.assert_allclose(float(j_cls), float(t_cls), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(j_bbox), float(t_bbox), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(j_ctr), float(t_ctr), rtol=1e-5, atol=1e-6)


def test_mil_bag_selection_matches_reference(torch_head):
    """mil_bag_selection (fcos_head_p2b_ts.py:1092-1145) vs the selection tail
    of train.mil.mil_stage: sigmoid/softmax-normalised scores gathered at the
    pseudo label, top-k weighted merge, the x-then-y clamp, beta blend. The
    torch side consumes OUR fine_proposals bags; our mil_stage runs end to end
    with stubbed towers (zero deltas -> refined bags == input bags; preset
    score tables)."""
    import jax
    from point_teacher_tpu.core.proposals import FineProposalCfg
    from point_teacher_tpu.train.mil import mil_stage

    rng = np.random.RandomState(40)
    g, c = 3, NUM_CLASSES
    img = 160.0
    fine_cfg = FineProposalCfg(base_ratios=(1.0,))
    ext_cfg = FineProposalCfg(base_ratios=(1.0, 1.2, 0.8))  # U2 = 9
    u = ext_cfg.num_bags
    top_k, beta = 3, 0.25
    # keep boxes away from the border so clamps don't mask order bugs
    cx = rng.uniform(30, img - 30, g) + 0.17
    cy = rng.uniform(30, img - 30, g) + 0.23
    bw = rng.uniform(10, 30, g)
    bh = rng.uniform(10, 30, g)
    boxes = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2],
                     -1).astype(np.float32)
    labels = rng.randint(0, c, g).astype(np.int64)
    cls_tab = rng.randn(g * u, c).astype(np.float32)
    ins_tab = rng.randn(g * u, c).astype(np.float32)

    def mil_regress(x, stage):
        return jnp.zeros((x.shape[0], 4), jnp.float32)

    def mil_classify(x, stage):
        return jnp.asarray(cls_tab), jnp.asarray(ins_tab)

    feat = jnp.asarray(rng.randn(1, 20, 20, 8).astype(np.float32))
    out = mil_stage(
        mil_regress, mil_classify, None, feat,
        jnp.asarray(boxes)[None], jnp.asarray(labels.astype(np.int32))[None],
        jnp.ones((1, g), bool), jnp.asarray(boxes)[None],
        fine_cfg, ext_cfg, stage=0, img_hw=(img, img), top_k=top_k, beta=beta,
        dn_hyper=0.2, neg_key=None, with_bags_loss=True)
    ours = np.asarray(out.refined_boxes[0])

    # torch side consumes the same bags; zero deltas mean the refined bags the
    # reference would select over are delta_decode(ext, 0) = image-clamped ext
    from point_teacher_tpu.core.proposals import delta_decode, fine_proposals
    props, _ = fine_proposals(jnp.asarray(boxes), fine_cfg, (img, img))
    ext, ext_valid = fine_proposals(props.reshape(-1, 4), ext_cfg, (img, img))
    ext = np.asarray(delta_decode(ext.reshape(-1, 4),
                                  jnp.zeros((g * u, 4)), (img, img)))
    torch_head.topk, torch_head.beta = top_k, beta
    bbox_results = {
        "cls_score": torch.from_numpy(cls_tab.reshape(g, 1, u, c)),
        "ins_score": torch.from_numpy(ins_tab.reshape(g, 1, u, c)),
        "extensive_bags": [torch.from_numpy(ext.reshape(g * u, 4))],
        "extensive_bags_valid": [torch.from_numpy(
            np.asarray(ext_valid).reshape(g * u, 1))],
    }
    with torch.no_grad():
        merged = torch_head.mil_bag_selection(
            bbox_results, [{"img_shape": (int(img), int(img), 3)}],
            [torch.from_numpy(boxes)], [torch.from_numpy(labels)])

    np.testing.assert_allclose(ours, merged[0].numpy(), rtol=1e-5, atol=1e-4)


@pytest.fixture(scope="module")
def torch_rhead_losses():
    """Rotated head with the SHIPPED SODA-A losses (RotatedIoULoss burn-1)."""
    torch.manual_seed(2)
    return REF.r_head.TS_P2RBRotatedFCOSHead(
        num_classes=9, in_channels=256, stacked_convs=1, feat_channels=32,
        strides=[8], center_sampling=True, norm_on_bbox=True,
        separate_angle=False, scale_angle=True, mil_stack_conv=0,
        num_stages=2, train_cfg=TRAIN_CFG,
        loss_bbox_burn1=dict(type="RotatedIoULoss", loss_weight=1.0),
        bbox_coder=dict(type="DistanceAnglePointCoder", angle_version="le90"),
        bbox_roi_extractor=dict(type="RotatedSingleRoIExtractor"),
    )


def _rdense_preds(seed, b=2, n=20, c=9):
    r = np.random.RandomState(seed)
    cls = r.randn(b, c, n, n).astype(np.float32)
    bbox = (np.abs(r.randn(b, 4, n, n)) * 8 + 0.5).astype(np.float32)
    angle = (r.randn(b, 1, n, n) * 0.5).astype(np.float32)
    ctr = r.randn(b, 1, n, n).astype(np.float32)
    return cls, bbox, angle, ctr


def test_rotated_pseudo_branch_loss_matches_reference(torch_rhead_losses):
    """rotated loss_pseudo (rotated_fcos_head_p2rb_ts.py:417-528) vs
    pseudo_branch_loss_rotated: focal cls, centerness-weighted RotatedIoULoss
    (log mode) on DistanceAnglePointCoder-decoded 5-dim boxes (the torch
    side's diff_iou_rotated_2d is a cv2 geometry oracle), centerness BCE.
    Also exercises our sparse top-k positive gather (max_pos) for exactness."""
    from point_teacher_tpu.train.rdense_losses import (
        RDenseLossCfg, pseudo_branch_loss_rotated)

    pts = _grid_points()
    cls, bbox, angle, ctr = _rdense_preds(50)
    r = np.random.RandomState(51)
    gts, prs, labs = [], [], []
    for s in (50, 51):
        _, rboxes, _, labels = _random_rcase(s)
        g = rboxes.shape[0]
        gp = np.stack([r.uniform(10, 150, g) + r.uniform(0.05, 0.3, g),
                       r.uniform(10, 150, g) + r.uniform(0.05, 0.3, g)],
                      -1).astype(np.float32)
        gts.append(gp); prs.append(rboxes); labs.append(labels)

    with torch.no_grad():
        t_cls, t_bbox, t_ctr = torch_rhead_losses.loss_pseudo(
            [torch.from_numpy(cls)], [torch.from_numpy(bbox)],
            [torch.from_numpy(angle)], [torch.from_numpy(ctr)],
            [torch.from_numpy(pts)],
            [torch.from_numpy(x) for x in gts],
            [torch.from_numpy(x) for x in labs],
            [torch.from_numpy(x) for x in gts],
            [torch.from_numpy(x) for x in labs],
            [torch.from_numpy(x) for x in prs],
            [None, None],
            [{"ori_filename": "a.png"}, {"ori_filename": "b.png"}],
            [None, None], False)

    cfg = RDenseLossCfg(num_classes=9)
    j_cls, j_bbox, j_ctr = pseudo_branch_loss_rotated(
        _nhwc_flat(cls), _nhwc_flat(bbox), _nhwc_flat(angle),
        _nhwc_flat(ctr)[..., 0], jnp.asarray(pts), jnp.asarray(np.stack(gts)),
        jnp.asarray(np.stack(labs).astype(np.int32)),
        jnp.ones((2, gts[0].shape[0]), bool), jnp.asarray(np.stack(prs)),
        jnp.ones((2, prs[0].shape[0]), bool), cfg)

    np.testing.assert_allclose(float(j_cls), float(t_cls), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(j_bbox), float(t_bbox), rtol=5e-4, atol=1e-4)
    np.testing.assert_allclose(float(j_ctr), float(t_ctr), rtol=1e-5, atol=1e-6)


def test_rotated_syn_branch_loss_matches_reference(torch_rhead_losses):
    """rotated loss (syn branch, :535-627) vs syn_branch_loss_rotated."""
    from point_teacher_tpu.train.rdense_losses import (
        RDenseLossCfg, syn_branch_loss_rotated)

    pts = _grid_points()
    cls, bbox, angle, ctr = _rdense_preds(60)
    cases = [_random_rcase(s)[1] for s in (60, 61)]

    with torch.no_grad():
        t_bbox, t_ctr = torch_rhead_losses.loss(
            [torch.from_numpy(cls)], [torch.from_numpy(bbox)],
            [torch.from_numpy(angle)], [torch.from_numpy(ctr)],
            [torch.from_numpy(pts)],
            [torch.from_numpy(x) for x in cases],
            [{"ori_filename": "a.png"}, {"ori_filename": "b.png"}])

    cfg = RDenseLossCfg(num_classes=9)
    gb = jnp.asarray(np.stack(cases))
    j_bbox, j_ctr = syn_branch_loss_rotated(
        _nhwc_flat(cls), _nhwc_flat(bbox), _nhwc_flat(angle),
        _nhwc_flat(ctr)[..., 0], jnp.asarray(pts), gb,
        jnp.ones(gb.shape[:2], bool), cfg)

    np.testing.assert_allclose(float(j_bbox), float(t_bbox), rtol=5e-4, atol=1e-4)
    np.testing.assert_allclose(float(j_ctr), float(t_ctr), rtol=1e-5, atol=1e-6)


# ---------------- multiclass NMS wrapper ----------------

def _load_reference_multiclass_nms():
    """Load the REAL mmdet bbox_nms.py with mmcv's batched_nms bridged to an
    exact sequential torch/numpy greedy NMS (independent oracle)."""
    import importlib
    from _ref_stubs import _mod, _pkg

    def greedy_batched_nms(boxes, scores, idxs, nms_cfg, class_agnostic=False):
        iou_thr = nms_cfg["iou_threshold"]
        if boxes.numel() == 0:
            return (torch.cat([boxes, scores[:, None]], -1),
                    torch.zeros(0, dtype=torch.long))
        offsets = idxs.to(boxes) * (boxes.max() + 1)
        bn = (boxes + offsets[:, None]).numpy()
        sc = scores.numpy()
        areas = (bn[:, 2] - bn[:, 0]) * (bn[:, 3] - bn[:, 1])
        order = np.argsort(-sc)
        sup = np.zeros(len(bn), bool)
        keep = []
        for i in order:
            if sup[i]:
                continue
            keep.append(i)
            xx1 = np.maximum(bn[i, 0], bn[:, 0])
            yy1 = np.maximum(bn[i, 1], bn[:, 1])
            xx2 = np.minimum(bn[i, 2], bn[:, 2])
            yy2 = np.minimum(bn[i, 3], bn[:, 3])
            inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
            iou = inter / np.maximum(areas[i] + areas - inter, 1e-12)
            sup |= iou > iou_thr
            sup[i] = True  # self marked; already kept
        keep = torch.tensor(keep, dtype=torch.long)
        return torch.cat([boxes[keep], scores[keep][:, None]], -1), keep

    _mod("mmcv.ops.nms", batched_nms=greedy_batched_nms)
    _pkg("refhbb.core.post_processing",
         "/root/reference/HBB_TOD/mmdet/core/post_processing")
    return importlib.import_module("refhbb.core.post_processing.bbox_nms")


def test_multiclass_nms_matches_reference_wrapper():
    """Our multiclass_nms vs the reference's REAL bbox_nms.py on a dense
    overlapping scene with scores straddling score_thr: pins the raw-score-
    before-factor threshold rule (bbox_nms.py:52-63 — a raw score above thr
    survives even when the centerness product falls below it), the bg-column
    convention, per-class suppression, and max_num ordering."""
    from point_teacher_tpu.ops.nms import multiclass_nms

    bn = _load_reference_multiclass_nms()
    r = np.random.RandomState(70)
    n, c = 300, NUM_CLASSES
    cx = r.uniform(20, 140, n)
    cy = r.uniform(20, 140, n)
    w = r.uniform(4, 18, n)
    h = r.uniform(4, 18, n)
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                     -1).astype(np.float32)
    scores = r.uniform(0.0, 0.15, (n, c)).astype(np.float32)  # straddle 0.05
    ctr = r.uniform(0.1, 1.0, n).astype(np.float32)

    multi_scores = np.concatenate([scores, np.zeros((n, 1), np.float32)], -1)
    with torch.no_grad():
        t_dets, t_labels = bn.multiclass_nms(
            torch.from_numpy(boxes), torch.from_numpy(multi_scores),
            0.05, dict(iou_threshold=0.5), max_num=100,
            score_factors=torch.from_numpy(ctr))

    dets, labels, valid = multiclass_nms(
        jnp.asarray(boxes), jnp.asarray(scores), 0.05, 0.5, 100,
        score_factors=jnp.asarray(ctr))
    k = int(np.asarray(valid).sum())

    assert k == t_dets.shape[0]
    np.testing.assert_allclose(np.asarray(dets)[:k], t_dets.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(labels)[:k], t_labels.numpy())
    # non-vacuity: the threshold-order rule must be exercised
    prod = (scores * ctr[:, None]).reshape(-1)
    raw = scores.reshape(-1)
    assert ((raw > 0.05) & (prod <= 0.05)).any()


def test_get_bboxes_chain_matches_reference(torch_head):
    """Full inference chain — per-level top-k by max(score*ctr), decode with
    img_shape clamp, rescale, multiclass NMS — vs the reference's _get_bboxes
    (fcos_head_p2b_ts.py:863-1002) running its REAL bbox_nms.py."""
    import sys, types
    from point_teacher_tpu.inference import get_bboxes_single
    from point_teacher_tpu.train.config import InferenceCfg

    bn = _load_reference_multiclass_nms()
    REF.fcos_head.multiclass_nms = bn.multiclass_nms

    exp = types.ModuleType("mmdet.core.export")

    def get_k_for_topk(k, size):  # onnx_helper.py:45 (non-onnx branch)
        k = int(k)
        return k if 0 < k < int(size) else -1

    exp.get_k_for_topk = get_k_for_topk
    sys.modules["mmdet.core.export"] = exp

    r = np.random.RandomState(80)
    n = 20
    P, C = n * n, NUM_CLASSES
    pts = _grid_points(n)
    cls4 = (r.randn(1, C, n, n) * 2 - 2).astype(np.float32)
    bb4 = (np.abs(r.randn(1, 4, n, n)) * 12 + 1).astype(np.float32)
    ct4 = (r.randn(1, 1, n, n)).astype(np.float32)
    sf = np.array([0.8, 0.8, 0.8, 0.8], np.float32)

    class _Cfg(dict):
        __getattr__ = dict.__getitem__

    cfg_t = _Cfg(nms_pre=150, score_thr=0.05, nms=dict(iou_threshold=0.5),
                 max_per_img=100)
    with torch.no_grad():
        (t_dets, t_labels), = torch_head._get_bboxes(
            [torch.from_numpy(cls4)], [torch.from_numpy(bb4)],
            [torch.from_numpy(ct4)], [torch.from_numpy(pts)],
            (160, 160, 3), [sf], cfg_t, rescale=True)

    cfg_j = InferenceCfg(nms_pre=150, score_thr=0.05, nms_iou=0.5,
                         max_per_img=100)
    dets, labels, valid = get_bboxes_single(
        jnp.asarray(cls4.transpose(0, 2, 3, 1).reshape(P, C)),
        jnp.asarray(bb4.transpose(0, 2, 3, 1).reshape(P, 4)),
        jnp.asarray(ct4.transpose(0, 2, 3, 1).reshape(P)),
        jnp.asarray(pts), (160, 160), jnp.asarray(sf), cfg_j, rescale=True)
    k = int(np.asarray(valid).sum())

    assert k == t_dets.shape[0] and k > 0
    np.testing.assert_allclose(np.asarray(dets)[:k], t_dets.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(labels)[:k], t_labels.numpy())


def _load_reference_multiclass_nms_rotated():
    """Load the REAL mmrotate bbox_nms_rotated.py with mmcv's nms_rotated
    bridged to a sequential greedy NMS over the cv2 rotated-IoU oracle."""
    import importlib, sys
    from _ref_stubs import _pkg

    def _riou_cv2(a, b):
        import cv2
        r1 = ((float(a[0]), float(a[1])), (float(a[2]), float(a[3])),
              float(np.degrees(a[4])))
        r2 = ((float(b[0]), float(b[1])), (float(b[2]), float(b[3])),
              float(np.degrees(b[4])))
        ret, pts = cv2.rotatedRectangleIntersection(r1, r2)
        inter = float(cv2.contourArea(pts)) if pts is not None else 0.0
        union = float(a[2] * a[3] + b[2] * b[3]) - inter
        return inter / max(union, 1e-6)

    def greedy_nms_rotated(boxes, scores, iou_thr):
        bn = boxes.numpy()
        sc = scores.numpy()
        order = np.argsort(-sc)
        sup = np.zeros(len(bn), bool)
        keep = []
        for i in order:
            if sup[i]:
                continue
            keep.append(i)
            for j in order:
                if not sup[j] and j != i and _riou_cv2(bn[i], bn[j]) > iou_thr:
                    sup[j] = True
            sup[i] = True
        keep = torch.tensor(keep, dtype=torch.long)
        dets = torch.cat([boxes[keep], scores[keep][:, None]], -1)
        return dets, keep

    sys.modules["mmcv.ops"].nms_rotated = greedy_nms_rotated
    _pkg("refobb.core.post_processing",
         "/root/reference/OBB_TOD/mmrotate/core/post_processing")
    return importlib.import_module(
        "refobb.core.post_processing.bbox_nms_rotated")


def test_rotated_get_bboxes_chain_matches_reference(torch_rhead):
    """Rotated inference chain vs the reference _get_bboxes_single
    (:998-1090): RAW-max-score top-k (the centerness-weighted ranking is
    commented out in the reference — a quirk the HBB path does not share),
    distance2obb decode (max_shape ignored), (cx,cy,w,h)/scale rescale, and
    the REAL bbox_nms_rotated.py running on the cv2 IoU oracle."""
    import types
    from point_teacher_tpu.inference import get_rbboxes_single
    from point_teacher_tpu.train.config import InferenceCfg

    bnr = _load_reference_multiclass_nms_rotated()
    REF.r_head.multiclass_nms_rotated = bnr.multiclass_nms_rotated

    r = np.random.RandomState(90)
    n = 16
    P, C = n * n, 9
    pts = _grid_points(n)
    cls2 = (r.randn(C, n, n) * 2 - 2).astype(np.float32)
    bb2 = (np.abs(r.randn(4, n, n)) * 10 + 1).astype(np.float32)
    an2 = (r.randn(1, n, n) * 0.6).astype(np.float32)
    ct2 = r.randn(1, n, n).astype(np.float32)
    sf = np.array([0.75, 0.75, 0.75, 0.75], np.float32)

    class _Cfg(dict):
        __getattr__ = dict.__getitem__

    cfg_t = _Cfg(nms_pre=120, score_thr=0.05,
                 nms=_Cfg(iou_thr=0.1), max_per_img=60)
    with torch.no_grad():
        t_dets, t_labels = torch_rhead._get_bboxes_single(
            [torch.from_numpy(cls2)], [torch.from_numpy(bb2)],
            [torch.from_numpy(an2)], [torch.from_numpy(ct2)],
            [torch.from_numpy(pts)], (120, 120, 3), sf, cfg_t, rescale=True)

    cfg_j = InferenceCfg(nms_pre=120, score_thr=0.05, nms_iou=0.1,
                         max_per_img=60)
    dets, labels, valid = get_rbboxes_single(
        jnp.asarray(cls2.transpose(1, 2, 0).reshape(P, C)),
        jnp.asarray(np.concatenate(
            [bb2.transpose(1, 2, 0).reshape(P, 4),
             an2.transpose(1, 2, 0).reshape(P, 1)], -1)),
        jnp.asarray(ct2.transpose(1, 2, 0).reshape(P)),
        jnp.asarray(pts), jnp.asarray(sf), cfg_j)
    k = int(np.asarray(valid).sum())

    assert k == t_dets.shape[0] and k > 0
    np.testing.assert_allclose(np.asarray(dets)[:k], t_dets.numpy(),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(labels)[:k], t_labels.numpy())


def test_mil_bag_training_loss_matches_reference(torch_head):
    """mil_bag_training (fcos_head_p2b_ts.py:1147-1168, positive bags):
    sigmoid x valid-masked softmax-normalised ins, gfocal bag loss,
    num_sample = bags with any valid member — vs mil_stage's loss_mil_bags
    with the same preset score tables and the same fine_proposals bags."""
    import jax
    from point_teacher_tpu.core.proposals import FineProposalCfg, fine_proposals
    from point_teacher_tpu.train.mil import mil_stage

    rng = np.random.RandomState(41)
    g, c = 4, NUM_CLASSES
    img = 160.0
    fine_cfg = FineProposalCfg(base_ratios=(1.0,))
    ext_cfg = FineProposalCfg(base_ratios=(1.0, 1.3, 0.7))
    u = ext_cfg.num_bags
    # put one GT near the border so some bag members go IoF-invalid
    cx = np.array([30.0, 80.0, 120.0, 4.0]) + 0.13
    cy = np.array([40.0, 90.0, 60.0, 5.0]) + 0.21
    bw = rng.uniform(10, 30, g)
    bh = rng.uniform(10, 30, g)
    boxes = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2],
                     -1).astype(np.float32)
    labels = rng.randint(0, c, g).astype(np.int64)
    cls_tab = rng.randn(g * u, c).astype(np.float32)
    ins_tab = rng.randn(g * u, c).astype(np.float32)

    def mil_regress(x, stage):
        return jnp.zeros((x.shape[0], 4), jnp.float32)

    def mil_classify(x, stage):
        return jnp.asarray(cls_tab), jnp.asarray(ins_tab)

    feat = jnp.asarray(rng.randn(1, 20, 20, 8).astype(np.float32))
    out = mil_stage(
        mil_regress, mil_classify, None, feat,
        jnp.asarray(boxes)[None], jnp.asarray(labels.astype(np.int32))[None],
        jnp.ones((1, g), bool), jnp.asarray(boxes)[None],
        fine_cfg, ext_cfg, stage=0, img_hw=(img, img), top_k=1, beta=0.25,
        dn_hyper=0.2, neg_key=None, with_bags_loss=True)

    props, _ = fine_proposals(jnp.asarray(boxes), fine_cfg, (img, img))
    _, ext_valid = fine_proposals(props.reshape(-1, 4), ext_cfg, (img, img))
    assert not bool(np.asarray(ext_valid).all())  # border GT: non-vacuous mask

    bbox_results = {
        "cls_score": torch.from_numpy(cls_tab.reshape(g, 1, u, c)),
        "ins_score": torch.from_numpy(ins_tab.reshape(g, 1, u, c)),
        "iou_target": None,
        "extensive_bags_valid": [torch.from_numpy(
            np.asarray(ext_valid).reshape(g * u, 1))],
    }
    with torch.no_grad():
        want = torch_head.mil_bag_training(
            bbox_results, [torch.from_numpy(labels)], None)

    np.testing.assert_allclose(float(out.loss_mil_bags), float(want),
                               rtol=1e-5, atol=1e-6)
