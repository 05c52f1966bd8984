"""Grouped shared-window MIL pool: approximation-domain guard tests.

The grouped pools (ops/roi_align.py roi_align{,_rotated}_grouped) are exact
replacements for the reference's per-roi RoIAlign bag pooling
(fcos_head_p2b_ts.py:1182-1256) ONLY while every bag member's bilinear sample
grid fits the shared group window. These tests pin all three guard layers:

1. in-domain exactness: grouped == per-roi oracle at reference-scale boxes;
2. out-of-domain characterization: oversized (degenerate early-training
   pseudo) boxes DO deviate from the per-roi oracle — and the
   `cls_pool_coverage` diagnostic detects exactly that regime (<1.0);
3. the config fallback: `mil_pool_grouped=False` (PointTeacherConfig) routes
   MIL through the exact per-roi path, restoring oracle equality for
   geometries the window cannot cover.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from point_teacher_tpu.core.proposals import FineProposalCfg
from point_teacher_tpu.ops.roi_align import (
    roi_align,
    roi_align_grouped,
    roi_align_rotated_grouped,
    roi_align_rotated_matmul,
)
from point_teacher_tpu.train.mil import _group_window_coverage, mil_stage

H = W = 40  # feature cells at stride 8 -> 320px image
C = 16
WINDOW = 16  # small window so the out-of-domain regime is reachable in-test


def _feat(seed=0):
    r = np.random.RandomState(seed)
    return jnp.asarray(r.rand(H, W, C).astype(np.float32))


def _bags(cx, cy, size, ratios=(1.0, 1.25, 0.8)):
    """U members sharing (cx, cy), w/h ratio-scaled — the fine_proposals
    group structure (core/proposals.py)."""
    rois = [[cx - size * t / 2, cy - size * t / 2,
             cx + size * t / 2, cy + size * t / 2] for t in ratios]
    return jnp.asarray([rois], jnp.float32)  # [G=1, U, 4]


def test_grouped_pool_exact_within_window():
    feat = _feat()
    rois = _bags(150.0, 170.0, 40.0)  # 40px << window 16 cells = 128px
    centers = jnp.asarray([[150.0, 170.0]])
    got = roi_align_grouped(feat, rois, centers, out_size=7,
                            spatial_scale=1.0 / 8, chunk=1, window=WINDOW)
    want = roi_align(feat, rois[0], out_size=7, spatial_scale=1.0 / 8, chunk=4)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    cov = _group_window_coverage(rois[None], jnp.ones((1, 1, 3), bool),
                                 centers[None], (H, W), window=WINDOW)
    assert float(cov) == 1.0


def test_grouped_pool_deviates_beyond_window_and_coverage_detects_it():
    feat = _feat()
    # 220px box >> window 16 cells = 128px: samples clamp to the window border
    rois = _bags(150.0, 170.0, 220.0)
    centers = jnp.asarray([[150.0, 170.0]])
    got = roi_align_grouped(feat, rois, centers, out_size=7,
                            spatial_scale=1.0 / 8, chunk=1, window=WINDOW)
    want = roi_align(feat, rois[0], out_size=7, spatial_scale=1.0 / 8, chunk=4)
    diff = float(jnp.abs(got[0] - want).max())
    assert diff > 1e-3, "expected the window clamp to bite (non-vacuous test)"
    # ... and the logged diagnostic detects exactly this regime
    cov = _group_window_coverage(rois[None], jnp.ones((1, 1, 3), bool),
                                 centers[None], (H, W), window=WINDOW)
    assert float(cov) < 1.0
    # the clamped output is still finite and bounded by the feature range
    assert np.isfinite(np.asarray(got)).all()
    assert float(jnp.abs(got).max()) <= float(jnp.abs(feat).max()) + 1e-5


def test_grouped_pool_rotated_deviation_and_coverage():
    feat = _feat(1)
    for size, expect_exact in ((40.0, True), (230.0, False)):
        rr = jnp.asarray([[[150.0, 170.0, size, size * 0.7, 0.4],
                           [150.0, 170.0, size * 1.2, size * 0.8, 0.4]]],
                         jnp.float32)  # [G=1, U=2, 5]
        centers = jnp.asarray([[150.0, 170.0]])
        got = roi_align_rotated_grouped(feat, rr, centers, out_size=7,
                                        spatial_scale=1.0 / 8, chunk=1,
                                        window=WINDOW)
        # oracle: per-roi with a whole-map window (nothing can clamp)
        want = roi_align_rotated_matmul(feat, rr[0], out_size=7,
                                        spatial_scale=1.0 / 8, chunk=2,
                                        window=H)
        diff = float(jnp.abs(got[0] - want).max())
        if expect_exact:
            assert diff < 1e-4, diff
        else:
            assert diff > 1e-3, "window clamp should bite at 230px"


def _mil_args(boxes_px, img=320, seed=0):
    """Shared mil_stage invocation on a deterministic toy head."""
    r = np.random.RandomState(seed)
    b, g = 1, 2
    feat = jnp.asarray(r.rand(b, H, W, C).astype(np.float32))
    cxy = np.asarray([[100.0, 120.0], [220.0, 200.0]])
    boxes = np.concatenate([cxy - boxes_px / 2, cxy + boxes_px / 2], -1)
    boxes = jnp.asarray(boxes[None], jnp.float32)
    labels = jnp.asarray([[1, 3]], jnp.int32)
    valid = jnp.ones((b, g), bool)

    def regress(x, stage):
        return jnp.zeros((x.shape[0], 4), x.dtype)

    def classify(x, stage):
        m = x.mean((1, 2))
        return m[:, :4] * 3.0, m[:, 4:8] * 3.0

    fine = FineProposalCfg(base_ratios=(1.0,), shake_ratio=None,
                           min_scale=0.0, gen_num_neg=0)
    ext = FineProposalCfg(base_ratios=(1.0, 1.25, 0.8), shake_ratio=None,
                          min_scale=0.0)
    kw = dict(mil_feat=feat, boxes=boxes, labels=labels, boxes_valid=valid,
              real_boxes=boxes, fine_cfg=fine, ext_cfg=ext, stage=0,
              img_hw=(img, img), top_k=2, beta=0.25, dn_hyper=0.2,
              neg_key=None, with_bags_loss=True)
    return regress, classify, kw


@pytest.mark.parametrize("boxes_px,in_domain", [(40.0, True), (240.0, False)])
def test_mil_stage_fallback_matches_exact_per_roi(boxes_px, in_domain):
    regress, classify, kw = _mil_args(boxes_px)
    grouped = mil_stage(regress, classify, None, window=WINDOW, grouped=True, **kw)
    exact = mil_stage(regress, classify, None, window=WINDOW, grouped=False, **kw)
    # the fallback always reports full coverage (it IS the per-roi pool)
    assert float(exact.cls_pool_coverage) == 1.0
    if in_domain:
        # within the window the grouped pool is the per-roi pool
        assert float(grouped.cls_pool_coverage) == 1.0
        np.testing.assert_allclose(np.asarray(grouped.refined_boxes),
                                   np.asarray(exact.refined_boxes),
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(float(grouped.loss_mil_bags),
                                   float(exact.loss_mil_bags), rtol=1e-5)
    else:
        # out of domain: the diagnostic fires, and the deviation from the
        # exact path is real (characterized, not hoped away)
        assert float(grouped.cls_pool_coverage) < 1.0
        assert not np.allclose(np.asarray(grouped.loss_mil_bags),
                               np.asarray(exact.loss_mil_bags), rtol=1e-6)
        # both paths stay finite — the clamp degrades, it does not explode
        assert np.isfinite(float(grouped.loss_mil_bags))
        assert np.isfinite(np.asarray(grouped.refined_boxes)).all()
