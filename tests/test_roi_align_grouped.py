"""Grouped shared-window RoIAlign vs the exact per-roi oracles.

The MIL bags are groups by construction (core/proposals.py fine_proposals:
every member shares the reference box centre; only w/h are ratio-scaled or
shake-shifted by fractions of the box size), so a shared window per group is
exact while the members' sample grids fit it. These tests pin that exactness
AT THE SHIPPED BAG GEOMETRY (config_0pct / config_sodaa ext cfgs) and the
border behaviour near map edges.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from point_teacher_tpu.core.proposals import FineProposalCfg, fine_proposals
from point_teacher_tpu.ops.boxes import xyxy_to_cxcywh
from point_teacher_tpu.ops.roi_align import (
    roi_align_gather,
    roi_align_grouped,
    roi_align_matmul,
    roi_align_rotated,
    roi_align_rotated_grouped,
)


def _random_feat(rng, h=50, w=50, c=32):
    return jnp.asarray(rng.randn(h, w, c).astype(np.float32))


def _shipped_bags(rng, g, img=400.0, max_box=64.0, rotated=False):
    """Bags via the real fine_proposals at the shipped noisy ext cfg (the
    widest: ratios to 1.4 plus 0.1 shake)."""
    cfg = FineProposalCfg(base_ratios=(1.0, 1.2, 1.3, 1.4, 0.8, 0.7, 0.6),
                          shake_ratio=(0.1,), min_scale=4.0)
    cx = rng.uniform(40, img - 40, g)
    cy = rng.uniform(40, img - 40, g)
    bw = rng.uniform(8, max_box, g)
    bh = rng.uniform(8, max_box, g)
    boxes = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], -1)
    props, _ = fine_proposals(jnp.asarray(boxes.astype(np.float32)), cfg,
                              (img, img))
    centers = jnp.asarray(np.stack([cx, cy], -1).astype(np.float32))
    return props, centers  # [G, U, 4], [G, 2]


def test_grouped_matches_matmul_on_shipped_bags():
    rng = np.random.RandomState(0)
    feat = _random_feat(rng)
    props, centers = _shipped_bags(rng, g=9)
    g, u = props.shape[:2]

    got = roi_align_grouped(feat, props, centers, out_size=7,
                            spatial_scale=1 / 8, window=16, chunk=4)
    want = roi_align_matmul(feat, props.reshape(-1, 4), out_size=7,
                            spatial_scale=1 / 8).reshape(g, u, 7, 7, -1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_grouped_border_rule_near_map_edge():
    """Groups whose boxes hang off the map: the clamped window still covers
    the in-map part, and out-of-map samples contribute 0 (mmcv rule)."""
    rng = np.random.RandomState(1)
    feat = _random_feat(rng, 40, 40, 16)
    img = 320.0
    # centers pushed onto every edge/corner
    cx = np.array([4.0, 316.0, 160.0, 4.0, 316.0])
    cy = np.array([4.0, 4.0, 316.0, 316.0, 160.0])
    bw = np.full(5, 48.0)
    bh = np.full(5, 40.0)
    boxes = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], -1)
    cfg = FineProposalCfg(base_ratios=(1.0, 1.3, 0.7), shake_ratio=(0.1,))
    props, _ = fine_proposals(jnp.asarray(boxes.astype(np.float32)), cfg,
                              (img, img))
    centers = jnp.asarray(np.stack([cx, cy], -1).astype(np.float32))
    g, u = props.shape[:2]

    got = roi_align_grouped(feat, props, centers, window=16, chunk=8)
    want = roi_align_gather(feat, props.reshape(-1, 4)).reshape(g, u, 7, 7, -1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_grouped_bf16_close_to_f32():
    rng = np.random.RandomState(2)
    feat = _random_feat(rng)
    props, centers = _shipped_bags(rng, g=4)
    f32 = roi_align_grouped(feat, props, centers, window=16)
    b16 = roi_align_grouped(feat.astype(jnp.bfloat16), props, centers, window=16)
    np.testing.assert_allclose(np.asarray(b16, np.float32), np.asarray(f32),
                               rtol=0.06, atol=0.05)


def _rotated_bags(rng, g, img=400.0, max_box=45.0):
    """Rotated bags as mil_stage_rotated builds them: jitter the hbb part via
    fine_proposals, carry the angle."""
    cfg = FineProposalCfg(base_ratios=(1.0, 1.2, 1.3, 0.8, 0.6))
    cx = rng.uniform(40, img - 40, g)
    cy = rng.uniform(40, img - 40, g)
    bw = rng.uniform(8, max_box, g)
    bh = rng.uniform(8, max_box, g)
    ang = rng.uniform(-np.pi / 2, np.pi / 2, g)
    boxes = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], -1)
    props, _ = fine_proposals(jnp.asarray(boxes.astype(np.float32)), cfg,
                              (img, img))
    u = props.shape[1]
    chw = xyxy_to_cxcywh(props)
    angs = jnp.broadcast_to(jnp.asarray(ang.astype(np.float32))[:, None, None],
                            (g, u, 1))
    rrois = jnp.concatenate([chw, angs], -1)  # [G, U, 5]
    centers = jnp.asarray(np.stack([cx, cy], -1).astype(np.float32))
    return rrois, centers


def test_rotated_grouped_matches_gather_oracle():
    rng = np.random.RandomState(3)
    feat = _random_feat(rng)
    rrois, centers = _rotated_bags(rng, g=9)
    g, u = rrois.shape[:2]

    got = roi_align_rotated_grouped(feat, rrois, centers, window=16, chunk=4)
    want = roi_align_rotated(feat, rrois.reshape(-1, 5)).reshape(g, u, 7, 7, -1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_rotated_grouped_border_rule():
    rng = np.random.RandomState(4)
    feat = _random_feat(rng, 40, 40, 16)
    img = 320.0
    cx = np.array([6.0, 314.0, 160.0, 6.0])
    cy = np.array([6.0, 6.0, 314.0, 160.0])
    bw = np.full(4, 40.0)
    bh = np.full(4, 30.0)
    ang = np.array([0.3, -0.7, 1.1, 0.0])
    boxes = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], -1)
    cfg = FineProposalCfg(base_ratios=(1.0, 1.3))
    props, _ = fine_proposals(jnp.asarray(boxes.astype(np.float32)), cfg,
                              (img, img))
    u = props.shape[1]
    chw = xyxy_to_cxcywh(props)
    angs = jnp.broadcast_to(jnp.asarray(ang.astype(np.float32))[:, None, None],
                            (4, u, 1))
    rrois = jnp.concatenate([chw, angs], -1)
    centers = jnp.asarray(np.stack([cx, cy], -1).astype(np.float32))

    got = roi_align_rotated_grouped(feat, rrois, centers, window=16, chunk=2)
    want = roi_align_rotated(feat, rrois.reshape(-1, 5)).reshape(4, u, 7, 7, -1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_grouped_chunk_invariance_and_grad():
    rng = np.random.RandomState(5)
    feat = _random_feat(rng, 30, 30, 8)
    props, centers = _shipped_bags(rng, g=5, img=240.0, max_box=40.0)

    a = roi_align_grouped(feat, props, centers, window=16, chunk=2)
    b = roi_align_grouped(feat, props, centers, window=16, chunk=64)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)

    def loss_g(f):
        return jnp.sum(roi_align_grouped(f, props, centers, window=16) ** 2)

    def loss_o(f):
        return jnp.sum(roi_align_matmul(f, props.reshape(-1, 4)) ** 2)

    ga = jax.grad(loss_g)(feat)
    go = jax.grad(loss_o)(feat)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(go), rtol=1e-4, atol=1e-4)


def test_group_window_coverage_diagnostic():
    """coverage == 1 for shipped-geometry bags; < 1 when a member escapes."""
    from point_teacher_tpu.train.mil import _group_window_coverage

    rng = np.random.RandomState(6)
    props, centers = _shipped_bags(rng, g=4, img=400.0, max_box=60.0)
    boxes = props[None]  # [1, G, U, 4]
    ctr = centers[None]
    valid = jnp.ones(boxes.shape[:-1], bool)
    cov = _group_window_coverage(boxes, valid, ctr, (50, 50), window=32)
    assert float(cov) == 1.0

    # teleport one member 300px away from its group centre
    escaped = boxes.at[0, 0, 0].set(boxes[0, 0, 0] + 300.0)
    cov2 = _group_window_coverage(escaped, valid, ctr, (50, 50), window=32)
    assert float(cov2) < 1.0
