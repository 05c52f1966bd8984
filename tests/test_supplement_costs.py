"""Differential tests for the Supplement_config/bbox novel match costs.

Supplement_config/ is the reference's drop-in module set for EXTERNAL
baseline repos (P2BNet, PLUG, PointOBB, Point2Rbox — their model classes are
not implemented anywhere in the reference tree; see the PARITY.md
adjudication). Diffing Supplement_config/bbox/ against the HBB fork shows the
TopkAssigner/FUSETopkAssigner/PointCost/... files are byte-identical or stock
upstream; the only classes that exist nowhere else are SigmoidCECost and
RIoUCost (match_cost.py:196, :263) plus the rrbbox_overlaps wrapper
(iou_calculators/iou2d_calculator.py:312). These tests run the reference's
own files in place (tests/_ref_stubs.py) against our core/costs.py versions.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from point_teacher_tpu.core.costs import riou_cost, sigmoid_ce_cost

import _ref_stubs


def test_sigmoid_ce_cost_matches_reference():
    supp = _ref_stubs.load_supplement_costs()
    r = np.random.RandomState(0)
    logits = r.randn(12, 8).astype(np.float32)
    labels = r.randint(0, 8, 5).astype(np.int64)
    want = supp.SigmoidCECost(weight=1.7)(
        torch.from_numpy(logits), torch.from_numpy(labels)).numpy()
    got = np.asarray(sigmoid_ce_cost(jnp.asarray(logits), jnp.asarray(labels),
                                     weight=1.7))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_riou_cost_matches_reference():
    supp = _ref_stubs.load_supplement_costs()
    r = np.random.RandomState(1)
    n, m = 6, 4
    pred = np.concatenate([
        r.uniform(40, 160, (n, 2)), r.uniform(8, 30, (n, 2)),
        r.uniform(-np.pi / 2, np.pi / 2, (n, 1)),
    ], -1).astype(np.float32)
    gt = np.concatenate([
        r.uniform(40, 160, (m, 2)), r.uniform(8, 30, (m, 2)),
        r.uniform(-np.pi / 2, np.pi / 2, (m, 1)),
    ], -1).astype(np.float32)
    # overlap some pairs so the test is non-vacuous
    gt[0] = pred[0]
    gt[1, :2] = pred[2, :2] + 3.0
    want = supp.RIoUCost(weight=2.0)(
        torch.from_numpy(pred), torch.from_numpy(gt)).numpy()
    got = np.asarray(riou_cost(jnp.asarray(pred), jnp.asarray(gt), weight=2.0))
    assert want.min() < -0.5, "no overlapping pair — vacuous scene"
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


def test_riou_cost_score_column_semantics():
    """The score-column (6-dim) tolerance lives in RRBboxOverlaps2D
    (iou2d_calculator.py:299-302); the reference's RIoUCost calls the bare
    rrbbox_overlaps, which ASSERTS dim==5 — 6-dim inputs crash it. Our
    riou_cost adopts the RRBboxOverlaps2D slicing (strictly more permissive;
    identical on every input the reference accepts)."""
    supp = _ref_stubs.load_supplement_costs()
    r = np.random.RandomState(2)
    pred5 = np.concatenate([
        r.uniform(40, 160, (3, 2)), r.uniform(8, 30, (3, 2)),
        r.uniform(-1.0, 1.0, (3, 1)),
    ], -1).astype(np.float32)
    pred6 = np.concatenate([pred5, r.rand(3, 1).astype(np.float32)], -1)
    got5 = np.asarray(riou_cost(jnp.asarray(pred5), jnp.asarray(pred5)))
    got6 = np.asarray(riou_cost(jnp.asarray(pred6), jnp.asarray(pred6)))
    np.testing.assert_allclose(got5, got6, rtol=1e-6)
    with pytest.raises(AssertionError):
        supp.RIoUCost()(torch.from_numpy(pred6), torch.from_numpy(pred6))
    # RRBboxOverlaps2D itself is broken in the reference: its __call__
    # (iou2d_calculator.py:303) references `rbbox_overlaps`, a name never
    # defined or imported in that file — any call NameErrors. The intended
    # semantics (slice the score column, then rotated IoU) is what our
    # riou_cost implements; the function-level oracle pins the value:
    with pytest.raises(NameError):
        supp.RRBboxOverlaps2D()(torch.from_numpy(pred6),
                                torch.from_numpy(pred6))
    want = supp.rrbbox_overlaps(torch.from_numpy(pred6[:, :5]),
                                torch.from_numpy(pred6[:, :5])).numpy()
    np.testing.assert_allclose(got6, -want, rtol=1e-3, atol=2e-3)
