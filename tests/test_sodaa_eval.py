import json
import os

import numpy as np

from point_teacher_tpu.evalx.rgeometry import (
    nms_rotated_np, obb2poly_np, poly2obb_np, rbox_iou_np,
)
from point_teacher_tpu.evalx.sodaa import (
    merge_patch_detections, parse_patch_name, sodaa_evaluate,
)


def test_poly2obb_roundtrip():
    rb = np.array([[50.0, 60.0, 20.0, 10.0, 0.4]])
    poly = obb2poly_np(rb).reshape(-1)
    out = poly2obb_np(poly)
    assert out is not None
    cx, cy, w, h, a = out
    assert np.isclose(cx, 50, atol=1e-3) and np.isclose(cy, 60, atol=1e-3)
    # (w,h,a) may be the swapped-equivalent; compare via IoU
    iou = rbox_iou_np(rb, np.array([[cx, cy, w, h, a]]))
    assert iou[0, 0] > 0.999


def test_rbox_iou_np_identity_and_disjoint():
    rb = np.array([[10.0, 10.0, 8.0, 4.0, 0.3], [100.0, 100.0, 8.0, 4.0, 0.0]])
    iou = rbox_iou_np(rb, rb)
    assert np.isclose(iou[0, 0], 1.0, atol=1e-6)
    assert iou[0, 1] == 0.0


def test_nms_rotated_np():
    rb = np.array([[10.0, 10.0, 8.0, 4.0, 0.3], [10.0, 10.0, 8.0, 4.0, 0.31],
                   [50.0, 50.0, 8.0, 4.0, 0.0]])
    keep = nms_rotated_np(rb, np.array([0.9, 0.8, 0.7]), 0.5)
    assert sorted(keep.tolist()) == [0, 2]


def test_parse_patch_name():
    assert parse_patch_name("00001__800__3900___0.jpg") == ("00001", 3900, 0)
    assert parse_patch_name("00299__800__650___1950.jpg") == ("00299", 650, 1950)


def test_merge_patch_detections_translates_and_dedups():
    # same physical box seen in two overlapping patches
    d1 = (np.array([[100.0, 100.0, 10.0, 6.0, 0.2]]), np.array([0.9]), np.array([0]))
    d2 = (np.array([[50.0, 50.0, 10.0, 6.0, 0.2]]), np.array([0.8]), np.array([0]))
    merged = merge_patch_detections(
        ["img__800__0___0.jpg", "img__800__50___50.jpg"], [d1, d2], num_classes=2
    )
    rb, sc, lb = merged["img"]
    assert len(rb) == 1  # duplicate suppressed after translation
    assert np.allclose(rb[0][:2], [100, 100])
    assert np.isclose(sc[0], 0.9)


def test_sodaa_evaluate_perfect():
    gt = dict(
        img_ids=["a"],
        classes=["c0", "c1"],
        annotations=[dict(boxes=np.array([[20.0, 20.0, 10.0, 6.0, 0.3]],
                                         np.float32),
                          labels=np.array([0]))],
    )
    dets = [(np.array([[20.0, 20.0, 10.0, 6.0, 0.3]], np.float32),
             np.array([0.9], np.float32), np.array([0]))]
    stats = sodaa_evaluate(gt, dets)
    assert np.isclose(stats["AP"], 1.0)
    assert np.isclose(stats["AP_50"], 1.0)
    # 10x6 box area=60 -> eS bucket [0,144]
    assert np.isclose(stats["AP_eS"], 1.0)
    assert stats["AP_rS"] == -1.0  # no gts in that bucket


def test_sodaa_evaluate_loose_angle_penalised():
    gt = dict(
        img_ids=["a"], classes=["c0"],
        annotations=[dict(boxes=np.array([[20.0, 20.0, 16.0, 4.0, 0.0]], np.float32),
                          labels=np.array([0]))],
    )
    # rotated 45° -> low IoU with gt
    dets = [(np.array([[20.0, 20.0, 16.0, 4.0, 0.8]], np.float32),
             np.array([0.9], np.float32), np.array([0]))]
    stats = sodaa_evaluate(gt, dets)
    assert stats["AP"] < 0.1


def test_sodaa_dataset_loading(tmp_path):
    from point_teacher_tpu.data.sodaa import SODAADataset

    ann_dir = tmp_path / "anns"
    ann_dir.mkdir()
    poly = [10, 10, 30, 10, 30, 20, 10, 20]
    with open(ann_dir / "img__800__0___0.json", "w") as f:
        json.dump(dict(annotations=[dict(poly=poly, category_id=2)]), f)
    ds = SODAADataset(str(ann_dir), img_prefix="imgs")
    assert len(ds) == 1
    ann = ds.get_ann(0)
    assert ann["boxes"].shape == (1, 5)
    assert np.isclose(ann["boxes"][0, 0], 20.0, atol=1e-3)  # cx
    assert ann["labels"][0] == 2


def test_native_core_matches_numpy():
    from point_teacher_tpu.evalx import native
    from point_teacher_tpu.evalx.cocoeval import _iou_xyxy
    from point_teacher_tpu.evalx import rgeometry as rg

    if not native.available():
        import pytest
        pytest.skip("libptteval.so not built")
    rng = np.random.RandomState(0)
    d = rng.uniform(0, 80, (20, 2)).astype(np.float32)
    d = np.concatenate([d, d + rng.uniform(2, 30, (20, 2)).astype(np.float32)], -1)
    g = rng.uniform(0, 80, (9, 2)).astype(np.float32)
    g = np.concatenate([g, g + rng.uniform(2, 30, (9, 2)).astype(np.float32)], -1)
    assert np.allclose(native.iou_xyxy(d, g), _iou_xyxy(d, g), atol=1e-5)

    rb1 = np.stack([rng.uniform(20, 60, 12), rng.uniform(20, 60, 12),
                    rng.uniform(5, 25, 12), rng.uniform(5, 25, 12),
                    rng.uniform(-1.5, 1.5, 12)], -1).astype(np.float32)
    rb2 = rb1[::-1].copy()
    assert np.allclose(native.rbox_iou(rb1, rb2), rg.rbox_iou_np(rb1, rb2), atol=1e-4)

    scores = rng.rand(12).astype(np.float32)
    k1 = set(native.nms_rotated(rb1, scores, 0.4).tolist())
    k2 = set(rg.nms_rotated_np(rb1, scores, 0.4).tolist())
    assert k1 == k2

    iou = _iou_xyxy(d, g)
    gt_ig = np.zeros(9, bool)
    gt_ig[:2] = True
    dt_iou_n, dt_ig_n = native.match_greedy(iou, gt_ig, 0.25)
    # numpy reference (bypass the native fast path by calling internals)
    from point_teacher_tpu.evalx.cocoeval import _match_img
    import point_teacher_tpu.evalx.native as nat
    lib = nat._LIB
    nat._LIB = None
    try:
        dt_iou_r, dt_ig_r, _ = _match_img(d, g, gt_ig, 0.25, iou=iou)
    finally:
        nat._LIB = lib
    assert np.allclose(dt_iou_n, dt_iou_r, atol=1e-6)
    assert (dt_ig_n == dt_ig_r).all()
