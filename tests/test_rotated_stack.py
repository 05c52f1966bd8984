"""Rotated (OBB) stack tests: ops additions, head, pseudo gen, train step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from point_teacher_tpu.core.proposals import FineProposalCfg
from point_teacher_tpu.core.pseudo import FuseAssignerCfg
from point_teacher_tpu.core.rpseudo import generate_pseudo_rboxes
from point_teacher_tpu.models.rotated_detector import StudentRotatedFCOS
from point_teacher_tpu.ops.boxes import grid_points
from point_teacher_tpu.ops.losses import dn_rotated_iou_loss, rotated_iou_loss
from point_teacher_tpu.ops.rotated import (
    distance_angle_decode, norm_angle_le90, rbox_ltrb_targets,
)
from point_teacher_tpu.train.config import PointTeacherConfig
from point_teacher_tpu.train.optim import make_optimizer
from point_teacher_tpu.train.rsteps import build_rotated_train_step
from point_teacher_tpu.train.state import Batch, create_train_state

B, IMG, G = 2, 64, 5


def test_distance_angle_decode():
    # distance2obb: centre offset rotated by theta (see parity test vs the
    # reference coder in test_reference_parity_rotated.py)
    pts = jnp.array([[10.0, 20.0]])
    pred = jnp.array([[2.0, 3.0, 4.0, 5.0, 0.3]])
    out = np.asarray(distance_angle_decode(pts, pred))[0]
    c, s = np.cos(0.3), np.sin(0.3)
    assert np.allclose(out, [10 + c - s, 20 + s + c, 6.0, 8.0, 0.3], atol=1e-6)


def test_distance_angle_encode_decode_roundtrip():
    from point_teacher_tpu.ops.rotated import rbox_ltrb_targets

    r = np.random.RandomState(3)
    pts = jnp.asarray(r.uniform(40, 80, (6, 2)).astype(np.float32))
    rb = jnp.asarray(np.concatenate(
        [r.uniform(40, 80, (4, 2)), r.uniform(8, 30, (4, 2)),
         r.uniform(-np.pi / 2 + 0.01, np.pi / 2 - 0.01, (4, 1))],
        -1).astype(np.float32))
    ltrb = rbox_ltrb_targets(pts, rb)  # [P, G, 4]
    for g in range(4):
        pred5 = jnp.concatenate(
            [ltrb[:, g], jnp.broadcast_to(rb[g, 4], (6, 1))], -1)
        dec = np.asarray(distance_angle_decode(pts, pred5))
        np.testing.assert_allclose(dec, np.broadcast_to(np.asarray(rb[g]), (6, 5)),
                                   rtol=1e-4, atol=1e-3)


def test_norm_angle_le90():
    a = jnp.array([0.0, np.pi / 2, -np.pi / 2, np.pi, 2.0])
    out = np.asarray(norm_angle_le90(a))
    assert (out >= -np.pi / 2 - 1e-6).all() and (out < np.pi / 2 + 1e-6).all()
    assert np.isclose(out[0], 0.0)
    assert np.isclose(out[3], 0.0, atol=1e-6)  # pi wraps to 0


def test_rbox_ltrb_targets_axis_aligned():
    pts = jnp.array([[5.0, 5.0]])
    rb = jnp.array([[5.0, 5.0, 10.0, 6.0, 0.0]])
    t = np.asarray(rbox_ltrb_targets(pts, rb))[0, 0]
    assert np.allclose(t, [5.0, 3.0, 5.0, 3.0])


def test_rbox_ltrb_targets_rotated_center():
    # point at centre of a rotated box: l=r=w/2, t=b=h/2 regardless of angle
    pts = jnp.array([[30.0, 40.0]])
    rb = jnp.array([[30.0, 40.0, 8.0, 4.0, 0.7]])
    t = np.asarray(rbox_ltrb_targets(pts, rb))[0, 0]
    assert np.allclose(t, [4.0, 2.0, 4.0, 2.0], atol=1e-5)


def test_rotated_iou_loss_perfect():
    rb = jnp.array([[5.0, 5.0, 4.0, 2.0, 0.4]])
    assert float(rotated_iou_loss(rb, rb, avg_factor=1.0)) < 1e-3


def test_dn_rotated_iou_leq_base():
    pred = jnp.array([[5.0, 5.0, 4.0, 2.0, 0.0]])
    tgt = jnp.array([[5.0, 5.0, 4.4, 2.2, 0.0]])
    dn = float(dn_rotated_iou_loss(pred, tgt, avg_factor=1.0, hyper=0.2))
    base = float(rotated_iou_loss(pred, tgt, avg_factor=1.0))
    assert dn <= base + 1e-6


def test_generate_pseudo_rboxes_shapes():
    rng = jax.random.PRNGKey(0)
    pts = grid_points(8, 8, 8)
    g = 4
    gt_pts = jax.random.uniform(rng, (g, 2), minval=10, maxval=54)
    gt_rb = jnp.concatenate([gt_pts, jnp.full((g, 2), 10.0), jnp.zeros((g, 1))], -1)
    cls = jax.random.normal(rng, (64, 3))
    pred5 = jnp.concatenate([jnp.abs(jax.random.normal(rng, (64, 4))) * 6,
                             jax.random.normal(rng, (64, 1)) * 0.3], -1)
    out = generate_pseudo_rboxes(pts, cls, pred5, gt_pts, jnp.zeros(g, jnp.int32),
                                 jnp.ones(g, bool), gt_rb, 0.0, FuseAssignerCfg())
    assert out["pseudo_boxes"].shape == (g, 5)
    assert np.isfinite(np.asarray(out["pseudo_boxes"])).all()
    assert int(out["pseudo_valid"].sum()) > 0


@pytest.fixture(scope="module")
def rtiny():
    cfg = PointTeacherConfig(
        num_classes=4, img_size=IMG, max_gt=G, batch_size=B,
        num_training_burninstep1=G, num_training_burninstep2=G,
        position=0.0,
        fine_proposal_cfg=(
            FineProposalCfg(base_ratios=(1.0,), min_scale=0.0, gen_num_neg=8),),
        fine_proposal_extensive_cfg=(
            FineProposalCfg(base_ratios=(1.0, 1.2, 0.8), min_scale=4.0),),
    )
    model = StudentRotatedFCOS(num_classes=4, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, IMG, IMG, 3)), jnp.zeros((1, 7, 7, 256)),
                        method=StudentRotatedFCOS.init_all)
    tx = make_optimizer(params, cfg.optim)
    state = create_train_state(params, tx, num_images=8, max_gt=G, rng=rng)
    step = build_rotated_train_step(model, tx, cfg)
    return cfg, model, state, step


def _rbatch(seed=0):
    r = np.random.RandomState(seed)
    img = r.randint(0, 255, (B, IMG, IMG, 3)).astype(np.float32)
    cxy = r.uniform(14, IMG - 14, (B, G, 2)).astype(np.float32)
    wh = r.uniform(5, 12, (B, G, 2)).astype(np.float32)
    ang = r.uniform(-np.pi / 2, np.pi / 2, (B, G, 1)).astype(np.float32)
    rb = np.concatenate([cxy, wh, ang], -1)
    return Batch(
        image=jnp.array(img), gt_boxes=jnp.array(rb),
        gt_labels=jnp.array(r.randint(0, 4, (B, G)), dtype=jnp.int32),
        gt_valid=jnp.ones((B, G), bool),
        image_ids=jnp.arange(B, dtype=jnp.int32),
    )


def test_rotated_phase1_step(rtiny):
    cfg, model, state, step = rtiny
    new_state, metrics = step(state, _rbatch(0), phase1=True)
    for k in ("loss_cls", "loss_bbox", "loss_centerness", "total_loss"):
        assert np.isfinite(float(metrics[k])), (k, float(metrics[k]))
    assert int(new_state.step) == 1


def test_rotated_phase2_step(rtiny):
    cfg, model, state, step = rtiny
    new_state, metrics = step(state, _rbatch(1), phase1=False)
    assert np.isfinite(float(metrics["total_loss"]))
    assert "stage0_loss_mil_bags" in metrics


def test_rotated_inference():
    from point_teacher_tpu.inference import build_rotated_inference_fn
    from point_teacher_tpu.train.config import InferenceCfg

    model = StudentRotatedFCOS(num_classes=4, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, IMG, IMG, 3)), jnp.zeros((1, 7, 7, 256)),
                        method=StudentRotatedFCOS.init_all)
    cfg = InferenceCfg(nms_pre=32, score_thr=0.001, nms_iou=0.1, max_per_img=16)
    infer = build_rotated_inference_fn(model, cfg, IMG)
    imgs = jax.random.uniform(rng, (1, IMG, IMG, 3)) * 255
    dets, labels, valid = infer(params, imgs, jnp.ones((1, 4)))
    assert dets.shape == (1, 16, 6)
    d = np.asarray(dets)
    assert np.isfinite(d).all()
    v = np.asarray(valid)[0]
    # w, h non-negative (norm_on_bbox relu-clamps distances; min_bbox_size=0)
    assert (d[0, v, 2] >= 0).all() and (d[0, v, 3] >= 0).all()


def test_sparse_positive_reg_loss_matches_dense():
    """The max_pos top-k gather in _rotated_reg_loss is exact: every excluded
    row has zero centerness weight, so losses (and grads) match the dense
    all-points evaluation bit-for-bit up to float reassociation."""
    from point_teacher_tpu.train.rdense_losses import _rotated_reg_loss

    rng = np.random.RandomState(0)
    b, p, g, c = 2, 400, 7, 5
    points = jnp.asarray(rng.uniform(0, 100, (p, 2)).astype(np.float32))
    bbox_pred = jnp.asarray(rng.uniform(1, 20, (b, p, 4)).astype(np.float32))
    angle_pred = jnp.asarray(rng.uniform(-1, 1, (b, p, 1)).astype(np.float32))
    ctr = jnp.asarray(rng.randn(b, p).astype(np.float32))
    # sparse positives: <= 3 per "gt column", like the assigner produces
    labels = np.full((b, p), c, np.int32)
    for bi in range(b):
        pos_idx = rng.choice(p, 3 * g, replace=False)
        labels[bi, pos_idx] = rng.randint(0, c, 3 * g)
    labels = jnp.asarray(labels)
    ltrb_t = jnp.asarray(rng.uniform(1, 30, (b, p, 4)).astype(np.float32))
    angle_t = jnp.asarray(rng.uniform(-1, 1, (b, p, 1)).astype(np.float32))

    def run(max_pos):
        def f(bp, ap):
            lb, lc = _rotated_reg_loss(bp, ap, ctr, points, labels, ltrb_t,
                                       angle_t, c, "log", max_pos=max_pos)
            return lb + lc
        val, grads = jax.value_and_grad(f, argnums=(0, 1))(bbox_pred, angle_pred)
        return val, grads

    v_dense, g_dense = run(None)
    v_sparse, g_sparse = run(3 * g)
    np.testing.assert_allclose(np.asarray(v_sparse), np.asarray(v_dense), rtol=1e-5)
    for gd, gs in zip(g_dense, g_sparse):
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gd), rtol=1e-5,
                                   atol=1e-7)
