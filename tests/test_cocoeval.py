import numpy as np

from point_teacher_tpu.evalx.cocoeval import COCOStyleEval, _iou_xyxy, _match_img, _olrp


def _gt(boxes_per_img, labels_per_img, classes=("a", "b")):
    return dict(
        img_ids=list(range(len(boxes_per_img))),
        classes=list(classes),
        annotations=[
            dict(boxes=np.asarray(b, np.float32).reshape(-1, 4),
                 labels=np.asarray(l, np.int64))
            for b, l in zip(boxes_per_img, labels_per_img)
        ],
    )


def test_perfect_detections_ap1():
    boxes = [[[0, 0, 10, 10], [20, 20, 40, 40]]]
    labels = [[0, 1]]
    gt = _gt(boxes, labels)
    dets = [(
        np.asarray(boxes[0], np.float32),
        np.asarray([0.9, 0.8], np.float32),
        np.asarray([0, 1]),
    )]
    stats = COCOStyleEval(gt, dets).evaluate()
    assert np.isclose(stats["mAP"], 1.0), stats
    assert np.isclose(stats["oLRP"], 0.0, atol=1e-6)


def test_missed_gt_halves_recall():
    # 2 gts of class 0, only 1 detected
    gt = _gt([[[0, 0, 10, 10], [30, 30, 42, 44]]], [[0, 0]])
    dets = [(
        np.asarray([[0, 0, 10, 10]], np.float32),
        np.asarray([0.9], np.float32),
        np.asarray([0]),
    )]
    stats = COCOStyleEval(gt, dets).evaluate()
    # AP = precision 1.0 up to recall 0.5, 0 beyond -> ~51/101
    assert 0.45 < stats["mAP"] < 0.55
    assert np.isclose(stats["AR@1500"], 0.5)
    # oLRP: TP=1 (perfect loc), FN=1: best LRP = (0 + 0 + 1)/2 = 0.5
    assert np.isclose(stats["oLRP"], 0.5)
    assert np.isclose(stats["oLRP_false_negative"], 0.5)


def test_false_positive_lowers_precision():
    gt = _gt([[[0, 0, 10, 10]]], [[0]])
    dets = [(
        np.asarray([[100, 100, 120, 120], [0, 0, 10, 10]], np.float32),
        np.asarray([0.95, 0.9], np.float32),
        np.asarray([0, 0]),
    )]
    stats = COCOStyleEval(gt, dets).evaluate()
    # recall reaches 1.0 but with precision 0.5 at that point
    assert np.isclose(stats["AR@1500"], 1.0)
    assert stats["mAP"] < 0.6


def test_iou_threshold_025_counts_loose_boxes():
    gt = _gt([[[0, 0, 10, 10]]], [[0]])
    loose = np.asarray([[0, 0, 10, 28]], np.float32)  # IoU ~ 0.357
    dets = [(loose, np.asarray([0.9], np.float32), np.asarray([0]))]
    s025 = COCOStyleEval(gt, dets, iou_thrs=(0.25,)).evaluate()
    s050 = COCOStyleEval(gt, dets, iou_thrs=(0.5,)).evaluate()
    assert np.isclose(s025["mAP"], 1.0)
    assert np.isclose(s050["mAP"], 0.0)


def test_size_buckets():
    # one very tiny (4x4) one medium (50x50) gt, both detected
    gt = _gt([[[0, 0, 4, 4], [100, 100, 150, 150]]], [[0, 0]])
    dets = [(
        np.asarray([[0, 0, 4, 4], [100, 100, 150, 150]], np.float32),
        np.asarray([0.9, 0.8], np.float32),
        np.asarray([0, 0]),
    )]
    stats = COCOStyleEval(gt, dets).evaluate()
    assert np.isclose(stats["mAP_vt"], 1.0)
    assert np.isclose(stats["mAP_m"], 1.0)
    # tiny/small buckets have no gts -> excluded (-1 propagates as absent)
    assert stats["mAP_t"] == -1.0 and stats["mAP_s"] == -1.0


def test_match_prefers_higher_iou():
    d = np.asarray([[0, 0, 10, 10, 0.9]], np.float32)
    g = np.asarray([[2, 2, 12, 12], [0, 0, 10, 10]], np.float32)
    dt_iou, dt_ig, nreg = _match_img(d, g, np.zeros(2, bool), 0.25)
    assert np.isclose(dt_iou[0], 1.0)


def test_olrp_perfect():
    out = _olrp(np.asarray([0.9]), np.asarray([1.0]), 1, 0.25)
    assert np.allclose(out, [0, 0, 0, 0])
