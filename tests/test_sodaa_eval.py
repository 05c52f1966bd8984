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
