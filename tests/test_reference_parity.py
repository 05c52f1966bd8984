"""Differential parity tests against the reference's OWN PyTorch modules.

The oracle here is not a restatement: each test executes the actual reference
source (loaded in place from /root/reference via tests/_ref_stubs.py, no code
copied) on randomized inputs and compares our JAX re-implementation
bit-for-bit (exact integer assignments) or to tight float tolerances.

Covered reference files:
- core/bbox/assigners/topk_assigner.py:14-147      vs core/assigners.py
- core/bbox/assigners/fuse_topk_assigner.py:14-121 vs core/assigners.py+pseudo
- core/bbox/match_costs/match_cost.py              vs core/costs.py
- models/losses/iou_loss.py (diou + DN bank)       vs ops/losses.py
- dense_heads/fcos_head_p2b_ts.py:736-794          vs core/pseudo.py
- detectors/data_augument_bank.py:1471-1494        vs core/augment.py
- core/bbox/coder/delta_xywh_bbox_coder.py         vs core/proposals.py
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from point_teacher_tpu.core.assigners import topk_assign  # noqa: E402
from point_teacher_tpu.core import costs as jcosts  # noqa: E402
from point_teacher_tpu.core.pseudo import FuseAssignerCfg, generate_pseudo_boxes  # noqa: E402
from point_teacher_tpu.core.augment import random_point_in_boxes  # noqa: E402
from point_teacher_tpu.ops import losses as jlosses  # noqa: E402
from point_teacher_tpu.ops.boxes import bbox_overlaps as jbbox_overlaps  # noqa: E402

from _ref_stubs import setup  # noqa: E402

REF = setup()


def _t(x):
    return torch.from_numpy(np.asarray(x))


# ---------------------------------------------------------------- match costs


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_focal_cost_matches_reference(seed):
    r = np.random.RandomState(seed)
    P, C, G = 64, 8, 9
    logits = r.randn(P, C).astype(np.float32)
    labels = r.randint(0, C, G)
    for weight in (1.0, 2.0):
        ref = REF.match_cost.FocalLossCost(weight=weight)(_t(logits), _t(labels))
        got = jcosts.focal_cost(jnp.asarray(logits), jnp.asarray(labels),
                                weight=weight)
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-5,
                                   atol=1e-6)


@pytest.mark.parametrize("mode", ["L1", "L2"])
def test_point_cost_matches_reference(mode):
    r = np.random.RandomState(3)
    pts = r.uniform(0, 100, (50, 4)).astype(np.float32)
    gts = r.uniform(0, 100, (7, 4)).astype(np.float32)
    ref = REF.match_cost.PointCost(mode=mode, weight=1.5)(_t(pts), _t(gts))
    got = jcosts.point_cost(jnp.asarray(pts), jnp.asarray(gts), weight=1.5,
                            mode=mode)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-5, atol=1e-5)


def test_insider_cost_matches_reference():
    r = np.random.RandomState(4)
    boxes = np.concatenate([r.uniform(0, 100, (40, 2)),
                            r.uniform(2, 30, (40, 2))], -1).astype(np.float32)
    gt_pts = r.uniform(0, 100, (11, 2)).astype(np.float32)
    ref = REF.match_cost.InsiderCost(weight=2.0)(_t(boxes), _t(gt_pts))
    got = jcosts.insider_cost(jnp.asarray(boxes), jnp.asarray(gt_pts), weight=2.0)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=0)


def test_centerness_cost_matches_reference():
    r = np.random.RandomState(5)
    c = r.uniform(0, 1, 30).astype(np.float32)
    g = r.uniform(0, 1, 6).astype(np.float32)
    ref = REF.match_cost.CenternessCost(mode="L1", weight=1.0)(_t(c), _t(g))
    got = jcosts.centerness_cost(jnp.asarray(c), jnp.asarray(g), weight=1.0)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-5, atol=1e-6)


def test_classification_and_l1_and_iou_costs_match_reference():
    r = np.random.RandomState(6)
    P, C, G = 20, 5, 4
    logits = r.randn(P, C).astype(np.float32)
    labels = r.randint(0, C, G)
    ref = REF.match_cost.ClassificationCost(weight=1.0)(_t(logits), _t(labels))
    got = jcosts.classification_cost(jnp.asarray(logits), jnp.asarray(labels))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-5, atol=1e-6)

    # BBoxL1Cost(box_format='xyxy') takes pred in cxcywh and converts; ours
    # takes both in xyxy — feed the converted form.
    from point_teacher_tpu.ops.boxes import cxcywh_to_xyxy

    a_c = np.concatenate([r.uniform(0.2, 0.8, (P, 2)),
                          r.uniform(0.05, 0.3, (P, 2))], -1).astype(np.float32)
    b = np.sort(r.uniform(0, 1, (G, 4)).astype(np.float32), -1)
    a = np.asarray(cxcywh_to_xyxy(jnp.asarray(a_c)))
    ref = REF.match_cost.BBoxL1Cost(weight=1.0, box_format="xyxy")(_t(a_c), _t(b))
    got = jcosts.bbox_l1_cost(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-5, atol=1e-5)

    ref = REF.match_cost.IoUCost(iou_mode="giou", weight=1.0)(_t(a), _t(b))
    got = jcosts.iou_cost(jnp.asarray(a), jnp.asarray(b), mode="giou")
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- bbox_overlaps


@pytest.mark.parametrize("mode", ["iou", "giou", "iof"])
def test_bbox_overlaps_matches_reference(mode):
    r = np.random.RandomState(7)
    a = np.concatenate([r.uniform(0, 80, (33, 2)),
                        r.uniform(80, 160, (33, 2))], -1).astype(np.float32)
    b = np.concatenate([r.uniform(0, 80, (12, 2)),
                        r.uniform(80, 160, (12, 2))], -1).astype(np.float32)
    a = a[:, [0, 1, 2, 3]]
    ref = REF.iou2d.bbox_overlaps(_t(a), _t(b), mode=mode)
    got = jbbox_overlaps(jnp.asarray(a), jnp.asarray(b), mode=mode)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- assigners


def _ref_topk(num_pre, topk, cls_w, reg_w):
    return REF.topk_assigner.TopkAssigner(
        num_pre=num_pre, topk=topk,
        cls_cost=dict(type="FocalLossCost", weight=cls_w),
        reg_cost=dict(type="PointCost", mode="L1", weight=reg_w))


@pytest.mark.parametrize("seed,num_pre,topk", [
    (0, 5, 3), (1, 7, 3), (2, 3, 3), (3, 1, 1), (4, 9, 2),
])
def test_topk_assigner_matches_reference(seed, num_pre, topk):
    """Bit-exact assignment parity incl. the any-column stage-2 quirk and the
    ascending-overwrite tie rule (topk_assigner.py:120-147)."""
    r = np.random.RandomState(seed)
    P, C, G = 128, 8, 11
    points = r.uniform(0, 100, (P, 2)).astype(np.float32)
    cls_logits = r.randn(P, C).astype(np.float32)
    gt_pts = r.uniform(0, 100, (G, 2)).astype(np.float32)
    gt_labels = r.randint(0, C, G)

    # reference consumes (bbox_pred, cls_pred, gt_bboxes, gt_labels) with
    # PointCost reading the first two dims of each box arg
    ref = _ref_topk(num_pre, topk, cls_w=1.0, reg_w=1.0).assign(
        _t(points), _t(cls_logits), _t(gt_pts), _t(gt_labels))
    ref_inds = ref.gt_inds.numpy() - 1  # 1-based -> 0-based, -1 = bg

    reg = jcosts.point_cost(jnp.asarray(points), jnp.asarray(gt_pts))
    stage2 = jcosts.focal_cost(jnp.asarray(cls_logits), jnp.asarray(gt_labels))
    got = np.asarray(topk_assign(reg, stage2, jnp.ones(G, bool), num_pre, topk))
    np.testing.assert_array_equal(got, ref_inds)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_fuse_topk_assigner_matches_reference(seed):
    """FUSETopkAssigner: stage-2 cost = FocalLossCost + InsiderCost
    (fuse_topk_assigner.py:89-102), shipped config num_pre=5 topk=3."""
    r = np.random.RandomState(100 + seed)
    P, C, G = 128, 8, 9
    points = r.uniform(0, 100, (P, 2)).astype(np.float32)
    cls_logits = r.randn(P, C).astype(np.float32)
    ctr = r.uniform(0, 1, P).astype(np.float32)
    boxes_cxcywh = np.concatenate([r.uniform(0, 100, (P, 2)),
                                   r.uniform(2, 40, (P, 2))], -1).astype(np.float32)
    gt_pts = r.uniform(0, 100, (G, 2)).astype(np.float32)
    gt_labels = r.randint(0, C, G)

    A = REF.fuse_topk_assigner.FUSETopkAssigner(
        num_pre=5, topk=3,
        cls_cost=dict(type="FocalLossCost", weight=1.0),
        reg_cost=dict(type="PointCost", mode="L1", weight=1.0),
        location_cost=dict(type="InsiderCost", weight=1.0))
    ref = A.assign(_t(boxes_cxcywh), _t(points), _t(cls_logits), _t(ctr),
                   _t(gt_pts), _t(gt_labels))
    ref_inds = ref.gt_inds.numpy() - 1

    reg = jcosts.point_cost(jnp.asarray(points), jnp.asarray(gt_pts))
    stage2 = (jcosts.focal_cost(jnp.asarray(cls_logits), jnp.asarray(gt_labels))
              + jcosts.insider_cost(jnp.asarray(boxes_cxcywh), jnp.asarray(gt_pts)))
    got = np.asarray(topk_assign(reg, stage2, jnp.ones(G, bool), 5, 3))
    np.testing.assert_array_equal(got, ref_inds)


# ---------------------------------------------------------------- DN losses


def test_diou_elementwise_matches_reference():
    r = np.random.RandomState(8)
    n = 64
    pred = np.concatenate([r.uniform(0, 50, (n, 2)),
                           r.uniform(50, 100, (n, 2))], -1).astype(np.float32)
    tgt = np.concatenate([r.uniform(0, 50, (n, 2)),
                          r.uniform(50, 100, (n, 2))], -1).astype(np.float32)
    ref = REF.iou_loss.diou_loss(_t(pred), _t(tgt), reduction="none")
    got = jlosses.diou_loss(jnp.asarray(pred), jnp.asarray(tgt),
                            weight=jnp.ones(n), avg_factor=1.0)
    np.testing.assert_allclose(float(got), float(ref.sum()), rtol=1e-4)


@pytest.mark.parametrize("hyper", [0.1, 0.2, 0.3])
def test_dn_diou_loss_matches_reference(hyper):
    """DN bank + the reference's scalar-mean base quirk: DN_diou_loss's base
    term is diou_loss(...)'s DEFAULT 'mean' reduction over all passed rows
    (iou_loss.py:398-466), added as a scalar to the per-element bank min."""
    r = np.random.RandomState(9)
    n = 48
    pred = np.concatenate([r.uniform(0, 50, (n, 2)),
                           r.uniform(50, 100, (n, 2))], -1).astype(np.float32)
    tgt = np.concatenate([r.uniform(0, 50, (n, 2)),
                          r.uniform(50, 100, (n, 2))], -1).astype(np.float32)
    w = r.uniform(0, 1, n).astype(np.float32)
    af = float(w.sum())

    loss_mod = REF.iou_loss.DN_DIoULoss(hyper=hyper, eps=1e-6)
    ref = loss_mod(_t(pred), _t(tgt), weight=_t(w), avg_factor=af)

    got = jlosses.dn_diou_loss(jnp.asarray(pred), jnp.asarray(tgt),
                               weight=jnp.asarray(w), avg_factor=af,
                               hyper=hyper)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-4)


# -------------------------------------------------------- pseudo-box averaging


@pytest.mark.parametrize("seed,filter_score", [(0, 0.0), (1, 0.0), (2, 0.25)])
def test_pseudo_box_generation_matches_reference(seed, filter_score):
    """_gnerate_pseudo_single (fcos_head_p2b_ts.py:736-794) called unbound on
    the actual reference source vs core/pseudo.generate_pseudo_boxes."""
    import types as _types

    r = np.random.RandomState(200 + seed)
    P, C, G = 256, 8, 7
    side = int(np.sqrt(P))
    ys, xs = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    points = np.stack([xs.reshape(-1) * 8 + 4, ys.reshape(-1) * 8 + 4],
                      -1).astype(np.float32)
    # de-tie the grid: on an exact stride-8 grid the L1 point distances tie
    # (one step left == one step up) and torch.topk's tie ORDER is
    # unspecified — the reference's own pick is arbitrary there, so exact
    # parity is only defined off the tie set.
    points += r.uniform(-0.5, 0.5, points.shape).astype(np.float32)
    cls_logits = r.randn(P, C).astype(np.float32)
    ltrb = r.uniform(1, 40, (P, 4)).astype(np.float32)
    ctr = r.uniform(0, 1, P).astype(np.float32)
    gt_pts = r.uniform(10, 110, (G, 2)).astype(np.float32)
    gt_labels = r.randint(0, C, G)
    wh = r.uniform(4, 30, (G, 2)).astype(np.float32)
    gt_boxes = np.concatenate([gt_pts - wh / 2, gt_pts + wh / 2], -1)

    fuse = REF.fuse_topk_assigner.FUSETopkAssigner(
        num_pre=5, topk=3,
        cls_cost=dict(type="FocalLossCost", weight=1.0),
        reg_cost=dict(type="PointCost", mode="L1", weight=1.0),
        location_cost=dict(type="InsiderCost", weight=1.0))
    head_self = _types.SimpleNamespace(fuse_assigner=fuse)
    ref_boxes, ref_points, ref_labels, ref_miou, ref_valid = (
        REF.fcos_head.TS_P2BFCOSHead._gnerate_pseudo_single(
            head_self, _t(gt_pts), _t(gt_labels), _t(gt_boxes.astype(np.float32)),
            _t(cls_logits), _t(ltrb), _t(ctr), None, None, filter_score,
            _t(points), None))

    out = generate_pseudo_boxes(
        jnp.asarray(points), jnp.asarray(cls_logits), jnp.asarray(ltrb),
        jnp.asarray(gt_pts), jnp.asarray(gt_labels), jnp.ones(G, bool),
        jnp.asarray(gt_boxes.astype(np.float32)), filter_score,
        FuseAssignerCfg(num_pre=5, topk=3))

    np.testing.assert_allclose(np.asarray(out["pseudo_boxes"]),
                               ref_boxes.numpy(), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["pseudo_points"]),
                               ref_points.numpy(), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(float(out["mean_iou"]), float(ref_miou),
                               rtol=1e-4, atol=1e-5)
    got_valid = np.flatnonzero(np.asarray(out["pseudo_valid"]))
    np.testing.assert_array_equal(got_valid, np.sort(ref_valid.numpy()))


# ------------------------------------------------------------- point sampling


@pytest.mark.parametrize("position", [0.0, 0.3, 0.6, 1.0])
def test_point_sampling_matches_reference_distribution(position):
    """random_point_in_quadrilateral (data_augument_bank.py:1471-1494):
    uniform inside the central `position` fraction. Exact support check +
    moment comparison over a large torch/JAX sample."""
    r = np.random.RandomState(11)
    M = 2000
    xy = r.uniform(0, 100, (M, 2)).astype(np.float32)
    wh = r.uniform(5, 40, (M, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], -1)

    torch.manual_seed(0)
    ref = REF.data_augument_bank.random_point_in_quadrilateral(
        _t(boxes), position).numpy()
    got = np.asarray(random_point_in_boxes(jax.random.PRNGKey(0),
                                           jnp.asarray(boxes), position))

    lo = boxes[:, :2] + wh * (1 - position) / 2
    hi = lo + wh * position
    for sample in (ref, got):
        assert (sample >= lo - 1e-4).all() and (sample <= hi + 1e-4).all()
    if position == 0.0:
        np.testing.assert_allclose(got, ref, atol=1e-4)  # both exactly center
    else:
        # same uniform law: compare normalized first/second moments
        u_ref = (ref - lo) / np.maximum(hi - lo, 1e-9)
        u_got = (got - lo) / np.maximum(hi - lo, 1e-9)
        np.testing.assert_allclose(u_ref.mean(0), u_got.mean(0), atol=0.03)
        np.testing.assert_allclose(u_ref.var(0), u_got.var(0), atol=0.02)


# ------------------------------------------------------------- delta decode


def test_delta_decode_matches_reference_coder():
    """DeltaXYWHBBoxCoder.decode with the MIL head's coder config
    (fcos_head_p2b_ts.py:182-184: target_means=0, target_stds=1) and the
    max_shape clamp of the mil_bag_extensive call (:1210-1211) vs
    core/proposals.delta_decode."""
    from point_teacher_tpu.core.proposals import delta_decode

    r = np.random.RandomState(12)
    n, H, W = 100, 96, 128
    xy = r.uniform(10, 90, (n, 2)).astype(np.float32)
    wh = r.uniform(4, 30, (n, 2)).astype(np.float32)
    rois = np.concatenate([xy - wh / 2, xy + wh / 2], -1)
    deltas = (r.randn(n, 4) * 0.5).astype(np.float32)

    coder = REF.delta_coder.DeltaXYWHBBoxCoder(
        target_means=[0.0, 0.0, 0.0, 0.0], target_stds=[1.0, 1.0, 1.0, 1.0])
    ref = coder.decode(_t(rois), _t(deltas), max_shape=(H, W)).numpy()
    got = np.asarray(delta_decode(jnp.asarray(rois), jnp.asarray(deltas),
                                  (H, W)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-3)


# ------------------------------------------------------- fine proposal bags
@pytest.mark.parametrize("base_ratios,shake_ratio,min_scale", [
    ((1.0, 1.2, 1.3, 0.8, 0.6), None, 4.0),
    ((1.0, 1.3, 0.8), (0.1,), 0.0),
])
def test_fine_proposals_match_reference(base_ratios, shake_ratio, min_scale):
    """fine_proposals_from_cfg (syn_images_generator_v2.py:159-233, the MIL
    bag generator) vs core/proposals.fine_proposals: same ratio grid order,
    shake expansion, min_scale clamp and iof>0.7 in-image validity."""
    from point_teacher_tpu.core.proposals import FineProposalCfg, fine_proposals

    r = np.random.RandomState(11)
    g = 9
    cxy = r.uniform(0, 64, (g, 2)).astype(np.float32)
    wh = r.uniform(3, 20, (g, 2)).astype(np.float32)
    boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1).astype(np.float32)
    cfg_ref = dict(gen_mode="refine", gen_proposal_mode="fix_gen",
                   cut_mode=None, shake_ratio=list(shake_ratio) if shake_ratio
                   else None, base_ratios=list(base_ratios),
                   min_scale=min_scale)
    img_meta = [dict(img_shape=(64, 64, 3))]
    props_ref, valid_ref = REF.syn_gen.fine_proposals_from_cfg(
        [_t(boxes)], cfg_ref, img_meta)
    props, valid = fine_proposals(
        jnp.asarray(boxes),
        FineProposalCfg(base_ratios=base_ratios, shake_ratio=shake_ratio,
                        min_scale=min_scale),
        (64, 64))
    u = props.shape[1]
    np.testing.assert_allclose(np.asarray(props).reshape(-1, 4),
                               props_ref[0].numpy(), rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(valid).reshape(-1),
        valid_ref[0].numpy().reshape(g, -1, 1).reshape(-1).astype(bool))
