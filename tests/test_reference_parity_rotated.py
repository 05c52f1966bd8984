"""Differential parity vs the reference's OWN rotated (OBB_TOD/mmrotate)
PyTorch modules, loaded in place under stub registries (tests/_ref_stubs.py
— no reference code copied). HBB-side parity lives in
test_reference_parity.py; this file covers the rotated fork:

- norm_angle / obb2poly / obb2xyxy (core/bbox/transforms.py, le90)
- DistanceAnglePointCoder.decode (core/bbox/coder/distance_angle_point_coder.py)
- TS_P2RBRotatedFCOSHead._gnerate_pseudo_single
  (models/dense_heads/rotated_fcos_head_p2rb_ts.py:871-935) — the rotated
  pseudo-box averaging; its rbbox_overlaps is bridged to a cv2
  rotatedRectangleIntersection oracle (independent of this repo's JAX IoU)
- random_point_in_quadrilateral (models/detectors/data_augument_bank.py:1705)
  — distribution match vs core/raugment.random_point_in_rboxes
"""
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
torch = pytest.importorskip("torch")

import _ref_stubs

REF = _ref_stubs.setup()

from point_teacher_tpu.core.pseudo import FuseAssignerCfg
from point_teacher_tpu.core.raugment import random_point_in_rboxes
from point_teacher_tpu.core.rpseudo import generate_pseudo_rboxes
from point_teacher_tpu.ops.rotated import (
    distance_angle_decode,
    norm_angle_le90,
    obb2poly,
    obb2xyxy,
)


def _t(x):
    return torch.from_numpy(np.asarray(x))


def _rand_rboxes(r, n, spread=200.0):
    return np.concatenate(
        [r.uniform(40, spread, (n, 2)), r.uniform(4, 60, (n, 2)),
         r.uniform(-np.pi / 2 + 1e-3, np.pi / 2 - 1e-3, (n, 1))],
        -1).astype(np.float32)


def test_norm_angle_matches_reference():
    a = np.linspace(-4.0, 4.0, 101).astype(np.float32)
    ref = REF.r_transforms.norm_angle(_t(a), "le90").numpy()
    got = np.asarray(norm_angle_le90(jnp.asarray(a)))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_obb2poly_matches_reference_le90():
    r = np.random.RandomState(0)
    rb = _rand_rboxes(r, 64)
    ref = REF.r_transforms.obb2poly(_t(rb), version="le90").numpy()
    got = np.asarray(obb2poly(jnp.asarray(rb)))
    # corner ORDER may differ by a cyclic shift; compare as corner sets by
    # sorting the 4 (x, y) pairs lexicographically per box
    def canon(p):
        p = p.reshape(-1, 4, 2)
        idx = np.lexsort((p[..., 1], p[..., 0]), axis=-1)
        return np.take_along_axis(p, idx[..., None], axis=1)
    np.testing.assert_allclose(canon(got), canon(ref), atol=2e-3)


def test_obb2xyxy_matches_reference_le90():
    r = np.random.RandomState(1)
    rb = _rand_rboxes(r, 64)
    ref = REF.r_transforms.obb2xyxy(_t(rb), version="le90").numpy()
    got = np.asarray(obb2xyxy(jnp.asarray(rb)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=2e-3)


def test_distance_angle_decode_matches_reference_coder():
    r = np.random.RandomState(2)
    P = 128
    points = r.uniform(0, 400, (P, 2)).astype(np.float32)
    pred = np.concatenate(
        [r.uniform(1, 50, (P, 4)), r.uniform(-2.5, 2.5, (P, 1))],
        -1).astype(np.float32)
    coder = REF.r_coder.DistanceAnglePointCoder(angle_version="le90")
    ref = coder.decode(_t(points), _t(pred)).numpy()
    got = np.asarray(distance_angle_decode(jnp.asarray(points), jnp.asarray(pred)))
    # the reference coder norm_angle's the decoded angle into le90
    got = np.concatenate(
        [got[:, :4], np.asarray(norm_angle_le90(jnp.asarray(got[:, 4:])))], -1)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("seed,filter_score", [(0, 0.0), (1, 0.0), (2, 0.25)])
def test_rotated_pseudo_generation_matches_reference(seed, filter_score):
    """_gnerate_pseudo_single called unbound on the actual reference source
    vs core/rpseudo.generate_pseudo_rboxes (same de-tie note as the HBB
    test: sub-pixel jitter keeps the stage-1 L1 distances off the tie set)."""
    import types as _types

    r = np.random.RandomState(300 + seed)
    P, C, G = 256, 9, 7
    side = int(np.sqrt(P))
    ys, xs = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    points = np.stack([xs.reshape(-1) * 8 + 4, ys.reshape(-1) * 8 + 4],
                      -1).astype(np.float32)
    points += r.uniform(-0.5, 0.5, points.shape).astype(np.float32)
    cls_logits = r.randn(P, C).astype(np.float32)
    pred5 = np.concatenate(
        [r.uniform(1, 40, (P, 4)), r.uniform(-1.4, 1.4, (P, 1))],
        -1).astype(np.float32)
    ctr = r.uniform(0, 1, P).astype(np.float32)
    gt_pts = r.uniform(10, 110, (G, 2)).astype(np.float32)
    gt_labels = r.randint(0, C, G)
    gt_rboxes = np.concatenate(
        [gt_pts, r.uniform(4, 30, (G, 2)),
         r.uniform(-np.pi / 2 + 0.05, np.pi / 2 - 0.05, (G, 1))],
        -1).astype(np.float32)

    fuse = REF.fuse_topk_assigner.FUSETopkAssigner(
        num_pre=5, topk=3,
        cls_cost=dict(type="FocalLossCost", weight=1.0),
        reg_cost=dict(type="PointCost", mode="L1", weight=1.0),
        location_cost=dict(type="InsiderCost", weight=1.0))
    coder = REF.r_coder.DistanceAnglePointCoder(angle_version="le90")
    head_self = _types.SimpleNamespace(fuse_assigner=fuse, bbox_coder=coder)
    ref_boxes, ref_points, ref_labels, ref_miou, ref_valid = (
        REF.r_head.TS_P2RBRotatedFCOSHead._gnerate_pseudo_single(
            head_self, _t(gt_pts), _t(gt_labels), _t(gt_rboxes),
            _t(cls_logits), _t(pred5), _t(ctr), None, None, filter_score,
            _t(points), None))

    out = generate_pseudo_rboxes(
        jnp.asarray(points), jnp.asarray(cls_logits), jnp.asarray(pred5),
        jnp.asarray(gt_pts), jnp.asarray(gt_labels), jnp.ones(G, bool),
        jnp.asarray(gt_rboxes), filter_score,
        FuseAssignerCfg(num_pre=5, topk=3))

    np.testing.assert_allclose(np.asarray(out["pseudo_boxes"]),
                               ref_boxes.numpy(), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["pseudo_points"]),
                               ref_points.numpy(), rtol=1e-4, atol=1e-3)
    # reference mean_iou runs through the cv2 oracle; ours through the
    # polygon clip — both exact rotated IoU
    np.testing.assert_allclose(float(out["mean_iou"]), float(ref_miou),
                               rtol=1e-3, atol=1e-3)
    got_valid = np.flatnonzero(np.asarray(out["pseudo_valid"]))
    np.testing.assert_array_equal(got_valid, np.sort(ref_valid.numpy()))


def test_rotated_point_sampling_matches_reference_distribution():
    """random_point_in_quadrilateral = random corner of a uniformly shrunk
    rotated box == uniform over the full rotated box (up to the reference's
    0.1px rounding); compare box-frame moments against
    random_point_in_rboxes(position=1.0)."""
    import jax

    r = np.random.RandomState(7)
    n = 4000
    rb = np.concatenate(
        [np.full((n, 2), 100.0), np.full((n, 1), 40.0), np.full((n, 1), 24.0),
         np.full((n, 1), 0.7)], -1).astype(np.float32)

    torch.manual_seed(0)
    ref_pts = REF.r_aug_bank.random_point_in_quadrilateral(
        _t(rb), version="le90").numpy()
    got_pts = np.asarray(random_point_in_rboxes(
        jax.random.PRNGKey(0), jnp.asarray(rb)[None], 1.0))[0]

    # rotate into the box frame, normalise by (w, h)
    c, s = np.cos(0.7), np.sin(0.7)
    def frame(p):
        d = p - rb[:, :2]
        return np.stack([(c * d[:, 0] + s * d[:, 1]) / rb[:, 2],
                         (-s * d[:, 0] + c * d[:, 1]) / rb[:, 3]], -1)
    fr, fg = frame(ref_pts), frame(got_pts)
    assert np.abs(fr).max() <= 0.5 + 1e-3 and np.abs(fg).max() <= 0.5 + 1e-3
    np.testing.assert_allclose(fr.mean(0), fg.mean(0), atol=0.02)
    np.testing.assert_allclose(fr.std(0), fg.std(0), atol=0.02)


def test_rotated_mil_bag_construction_matches_reference():
    """MIL_gen_proposals_from_cfg (OBB syn_images_generator_v2.py:26-41):
    bags jitter the axis-aligned (cx,cy,w,h) of the pseudo rbox while the
    pseudo ANGLE is carried through unchanged; reference boxes repeat the
    pseudo rbox. Mirrors train/mil.py mil_stage_rotated's ext_rb assembly."""
    import importlib
    import jax.numpy as jnp2

    from point_teacher_tpu.core.proposals import FineProposalCfg, fine_proposals
    from point_teacher_tpu.ops.boxes import cxcywh_to_xyxy, xyxy_to_cxcywh

    r_syn = importlib.import_module("refobb.models.detectors.syn_images_generator_v2")
    r = np.random.RandomState(5)
    g = 6
    rb = _rand_rboxes(r, g, spread=120.0)

    cfg_ref = dict(gen_mode="refine", gen_proposal_mode="fix_gen",
                   cut_mode=None, shake_ratio=None,
                   base_ratios=[1.0, 1.2, 0.8], min_scale=4.0)
    props_ref, valid_ref, refer_ref, real_ref = r_syn.MIL_gen_proposals_from_cfg(
        [_t(rb[:, :2])], [_t(rb)], cfg_ref, [_t(rb)],
        [dict(img_shape=(128, 128, 3))])

    hbb = cxcywh_to_xyxy(jnp.asarray(rb[:, :4]))
    props, valid = fine_proposals(
        hbb, FineProposalCfg(base_ratios=(1.0, 1.2, 0.8), min_scale=4.0),
        (128, 128))
    u = props.shape[1]
    ang = np.broadcast_to(rb[:, None, 4:5], (g, u, 1))
    ours5 = np.concatenate(
        [np.asarray(xyxy_to_cxcywh(props)), ang], -1).reshape(-1, 5)

    np.testing.assert_allclose(ours5, props_ref[0].numpy(), rtol=1e-4, atol=1e-3)
    np.testing.assert_array_equal(
        np.asarray(valid).reshape(-1),
        valid_ref[0].numpy().reshape(-1).astype(bool))
    np.testing.assert_allclose(
        np.broadcast_to(rb[:, None, :], (g, u, 5)).reshape(-1, 5),
        refer_ref[0].numpy(), rtol=1e-5)
