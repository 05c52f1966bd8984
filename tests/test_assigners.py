import jax.numpy as jnp
import numpy as np

from point_teacher_tpu.core.assigners import labels_from_assignment, topk_assign
from point_teacher_tpu.core import costs as C


def _oracle_assign(reg_cost, stage2_cost, num_pre, topk):
    """Direct numpy re-statement of the reference's two-stage loop
    (topk_assigner.py:119-144), including the any-column stage-2 quirk."""
    p, g = reg_cost.shape
    assigned = np.zeros(p, dtype=np.int64)  # 0 = bg, 1-based gt
    cand = np.argsort(reg_cost, axis=0, kind="stable")[:num_pre]  # [num_pre, G]
    for i in range(g):
        row_inds = cand[:, i]
        if len(row_inds) <= topk:
            assigned[row_inds] = i + 1
            continue
        cost_i = stage2_cost[row_inds, :]  # [num_pre, G]
        sel = np.argsort(cost_i, axis=0, kind="stable")[:topk].flatten()
        assigned[row_inds[sel]] = i + 1
    return assigned - 1  # 0-based, -1 bg


def test_topk_assign_no_stage2_matches_oracle():
    rng = np.random.RandomState(0)
    p, g = 50, 7
    reg = rng.rand(p, g).astype(np.float32)
    stage2 = rng.rand(p, g).astype(np.float32)
    valid = np.ones(g, dtype=bool)
    ours = np.asarray(topk_assign(jnp.array(reg), jnp.array(stage2), jnp.array(valid), 3, 3))
    ref = _oracle_assign(reg, stage2, 3, 3)
    assert (ours == ref).all()


def test_topk_assign_stage2_quirk_matches_oracle():
    rng = np.random.RandomState(1)
    p, g = 80, 6
    reg = rng.rand(p, g).astype(np.float32)
    stage2 = rng.rand(p, g).astype(np.float32)
    valid = np.ones(g, dtype=bool)
    ours = np.asarray(topk_assign(jnp.array(reg), jnp.array(stage2), jnp.array(valid), 5, 3))
    ref = _oracle_assign(reg, stage2, 5, 3)
    assert (ours == ref).all()


def test_topk_assign_padded_gts_ignored():
    rng = np.random.RandomState(2)
    p, g = 40, 8
    reg = rng.rand(p, g).astype(np.float32)
    stage2 = rng.rand(p, g).astype(np.float32)
    valid = np.array([True] * 5 + [False] * 3)
    ours = np.asarray(topk_assign(jnp.array(reg), jnp.array(stage2), jnp.array(valid), 3, 3))
    # no point may be assigned to an invalid gt
    assert ours.max() < 5
    # valid gts assigned same as oracle restricted to 5 gts
    ref = _oracle_assign(reg[:, :5], stage2[:, :5], 3, 3)
    # oracle on the 5-gt matrix; ours may differ only where padded gts would
    # have overwritten — but padded gts never assign, so equality holds
    assert (ours == ref).all()


def test_labels_from_assignment():
    assigned = jnp.array([-1, 0, 2])
    gt_labels = jnp.array([4, 5, 6])
    labels = np.asarray(labels_from_assignment(assigned, gt_labels, 8))
    assert labels.tolist() == [8, 4, 6]


def test_focal_cost_matches_reference_formula():
    rng = np.random.RandomState(3)
    logits = rng.randn(10, 4).astype(np.float32)
    labels = np.array([0, 2, 3])
    ours = np.asarray(C.focal_cost(jnp.array(logits), jnp.array(labels), weight=2.0))
    p = 1 / (1 + np.exp(-logits))
    alpha, gamma, eps = 0.25, 2.0, 1e-12
    neg = -np.log(1 - p + eps) * (1 - alpha) * p**gamma
    pos = -np.log(p + eps) * alpha * (1 - p) ** gamma
    ref = (pos - neg)[:, labels] * 2.0
    assert np.allclose(ours, ref, atol=1e-5)


def test_insider_cost():
    pred = jnp.array([[5.0, 5.0, 4.0, 4.0]])  # box (3,3)-(7,7)
    pts = jnp.array([[5.0, 5.0], [10.0, 10.0]])
    cost = np.asarray(C.insider_cost(pred, pts))
    assert cost[0, 0] == 0.0 and cost[0, 1] == 1.0


def test_point_cost():
    pts = jnp.array([[0.0, 0.0], [3.0, 4.0]])
    gts = jnp.array([[3.0, 4.0, 1.0, 1.0]])
    l1 = np.asarray(C.point_cost(pts, gts, mode="L1"))
    l2 = np.asarray(C.point_cost(pts, gts, mode="L2"))
    assert np.isclose(l1[0, 0], 7.0) and np.isclose(l1[1, 0], 0.0)
    assert np.isclose(l2[0, 0], 5.0)


def test_hungarian_assign_one_to_one():
    from point_teacher_tpu.core.hungarian import hungarian_assign_np

    rng = np.random.RandomState(0)
    p, g, c = 30, 4, 3
    pred = np.concatenate([rng.uniform(10, 50, (p, 2)), rng.uniform(4, 10, (p, 2))], -1)
    cls = rng.randn(p, c)
    ctr = rng.randn(p)
    gt_pts = rng.uniform(10, 50, (g, 2))
    gt_lab = rng.randint(0, c, g)
    valid = np.array([True, True, True, False])
    assigned = hungarian_assign_np(pred, cls, ctr, gt_pts, gt_lab, valid)
    # one-to-one: each valid gt assigned exactly once, invalid never
    fg = assigned[assigned >= 0]
    assert len(fg) == 3
    assert sorted(fg.tolist()) == [0, 1, 2]


def test_hierarchical_assign():
    from point_teacher_tpu.core.rfla import HieAssignerCfg, hierarchical_assign

    anchors = jnp.array([
        [0.0, 0.0, 8.0, 8.0], [8.0, 0.0, 16.0, 8.0], [0.0, 8.0, 8.0, 16.0],
        [40.0, 40.0, 48.0, 48.0], [100.0, 100.0, 108.0, 108.0],
    ])
    gts = jnp.array([[1.0, 1.0, 7.0, 7.0], [41.0, 41.0, 47.0, 47.0],
                     [0.0, 0.0, 1.0, 1.0]])
    valid = jnp.array([True, True, False])
    out = np.asarray(hierarchical_assign(anchors, gts, valid,
                                         HieAssignerCfg(topk=(2, 1))))
    assert out[0] == 0      # anchor 0 claimed by gt0
    assert out[3] == 1      # anchor 3 claimed by gt1
    assert (out != 2).all()  # padded gt never assigns
    # inside filter drops off-centre positives
    out2 = np.asarray(hierarchical_assign(
        anchors, gts, valid, HieAssignerCfg(topk=(2, 1), inside=True)))
    assert out2[0] == 0
