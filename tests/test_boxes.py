import jax.numpy as jnp
import numpy as np

from point_teacher_tpu.ops import boxes as B


def test_cxcywh_roundtrip():
    b = jnp.array([[10.0, 20.0, 30.0, 44.0], [0.0, 0.0, 2.0, 2.0]])
    assert np.allclose(B.xyxy_to_cxcywh(B.cxcywh_to_xyxy(b)), b, atol=1e-5)


def test_distance2bbox():
    pts = jnp.array([[12.0, 20.0]])
    d = jnp.array([[2.0, 3.0, 4.0, 5.0]])
    out = B.distance2bbox(pts, d)
    assert np.allclose(out, [[10.0, 17.0, 16.0, 25.0]])
    out2 = B.bbox2distance(pts, out)
    assert np.allclose(out2, d)


def test_bbox_overlaps_pairwise():
    b1 = jnp.array([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 15.0, 15.0]])
    b2 = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    iou = B.bbox_overlaps(b1, b2)
    assert iou.shape == (2, 1)
    assert np.isclose(iou[0, 0], 1.0, atol=1e-5)
    assert np.isclose(iou[1, 0], 25.0 / 175.0, atol=1e-5)


def test_bbox_overlaps_aligned_iof_giou():
    b1 = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b2 = jnp.array([[0.0, 0.0, 5.0, 10.0]])
    iof = B.bbox_overlaps(b1, b2, mode="iof", is_aligned=True)
    assert np.isclose(iof[0], 0.5, atol=1e-5)
    giou = B.bbox_overlaps(b1, b2, mode="giou", is_aligned=True)
    # enclosure == b1 here, so giou == iou
    assert np.isclose(giou[0], 0.5, atol=1e-5)
    # disjoint boxes: giou negative
    b3 = jnp.array([[20.0, 0.0, 30.0, 10.0]])
    giou2 = B.bbox_overlaps(b1, b3, mode="giou", is_aligned=True)
    assert giou2[0] < 0


def test_grid_points_ordering():
    pts = B.grid_points(2, 3, 8)
    # row-major over (y, x): first row y=4, x=4,12,20
    assert np.allclose(pts[:3], [[4, 4], [12, 4], [20, 4]])
    assert np.allclose(pts[3], [4, 12])


def test_tiny_metrics():
    from point_teacher_tpu.ops.tiny_metrics import (
        center_distance2, kl_similarity, wasserstein_similarity,
    )

    b = jnp.array([[10.0, 10.0, 14.0, 14.0]])
    # identical boxes: wd == 1/(1+eps) ~ 1, kl sim ~ 1
    assert float(wasserstein_similarity(b, b)[0, 0]) > 0.99
    assert float(kl_similarity(b, b)[0, 0]) > 0.99
    far = jnp.array([[100.0, 100.0, 104.0, 104.0]])
    assert float(wasserstein_similarity(b, far)[0, 0]) < 1e-3
    assert float(center_distance2(b, far)[0, 0]) > 1e4
    # tiny boxes: wd still discriminative where IoU is 0
    near = jnp.array([[15.0, 10.0, 19.0, 14.0]])  # disjoint, 5px away
    from point_teacher_tpu.ops.boxes import bbox_overlaps
    assert float(bbox_overlaps(b, near)[0, 0]) == 0.0
    assert float(wasserstein_similarity(b, near)[0, 0]) > \
        float(wasserstein_similarity(b, far)[0, 0])
