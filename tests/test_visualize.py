"""Detection drawing (imshow_det_bboxes / imshow_det_rbboxes analog)."""
import os

import numpy as np

from point_teacher_tpu.utils.visualize import imshow_det_bboxes, imshow_det_rbboxes


def test_imshow_det_bboxes_draws_and_writes(tmp_path):
    img = np.zeros((64, 64, 3), np.uint8)
    out = str(tmp_path / "sub" / "det.jpg")
    canvas = imshow_det_bboxes(
        img, np.array([[10, 10, 40, 40], [5, 5, 20, 30]]),
        np.array([0, 1]), np.array([0.9, 0.2]),
        class_names=("car", "ship"), score_thr=0.5, out_file=out,
    )
    assert canvas.shape == img.shape and canvas.dtype == np.uint8
    assert canvas.sum() > 0  # something was drawn
    assert os.path.exists(out)
    # score_thr filtered the second box: no strokes near (5, 24) column edge
    assert canvas[24, 5].sum() == 0


def test_imshow_det_rbboxes_draws_rotated(tmp_path):
    img = np.zeros((64, 64, 3), np.float32)
    out = str(tmp_path / "rdet.png")
    canvas = imshow_det_rbboxes(
        img, np.array([[32.0, 32.0, 20.0, 10.0, np.pi / 4]]),
        np.array([2]), np.array([0.8]), out_file=out,
    )
    assert canvas.sum() > 0
    assert os.path.exists(out)
