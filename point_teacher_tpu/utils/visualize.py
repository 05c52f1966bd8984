"""Detection visualization (cv2): imshow_det_bboxes / imshow_det_rbboxes analog.

Capability target: mmdet/core/visualization/image.py imshow_det_bboxes (used
by model.show_result via tools/test.py --show/--show-dir,
HBB_TOD/tools/test.py:47-49) and mmrotate's imshow_det_rbboxes
(OBB_TOD/mmrotate/core/visualization + data_augument_bank.py drawing). Writes
annotated images instead of interactive windows (headless TPU hosts).
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

# mmdet's default palette seed: deterministic per-class BGR colors
_rng = np.random.RandomState(42)
_PALETTE = _rng.randint(0, 256, (256, 3)).astype(np.int32)


def _color(label: int):
    c = _PALETTE[int(label) % len(_PALETTE)]
    return int(c[0]), int(c[1]), int(c[2])


def imshow_det_bboxes(
    img: np.ndarray,
    bboxes: np.ndarray,
    labels: np.ndarray,
    scores: Optional[np.ndarray] = None,
    class_names: Optional[Sequence[str]] = None,
    score_thr: float = 0.0,
    thickness: int = 1,
    font_scale: float = 0.35,
    out_file: Optional[str] = None,
) -> np.ndarray:
    """Draw horizontal xyxy boxes (+labels/scores) on an image copy.

    img: [H, W, 3] uint8/float (BGR like cv2); bboxes [N, 4]; labels [N];
    scores [N] optional. Returns the annotated image; writes out_file if set.
    """
    import cv2

    canvas = np.ascontiguousarray(np.clip(img, 0, 255).astype(np.uint8))
    bboxes = np.asarray(bboxes).reshape(-1, 4)
    labels = np.asarray(labels).reshape(-1)
    if scores is not None:
        scores = np.asarray(scores).reshape(-1)
        keep = scores >= score_thr
        bboxes, labels, scores = bboxes[keep], labels[keep], scores[keep]
    for i, (x1, y1, x2, y2) in enumerate(bboxes):
        col = _color(labels[i])
        cv2.rectangle(canvas, (int(x1), int(y1)), (int(x2), int(y2)), col, thickness)
        name = (class_names[int(labels[i])] if class_names is not None
                else f"cls{int(labels[i])}")
        text = f"{name}|{scores[i]:.2f}" if scores is not None else name
        cv2.putText(canvas, text, (int(x1), max(int(y1) - 2, 8)),
                    cv2.FONT_HERSHEY_SIMPLEX, font_scale, col, 1, cv2.LINE_AA)
    if out_file:
        os.makedirs(os.path.dirname(os.path.abspath(out_file)), exist_ok=True)
        cv2.imwrite(out_file, canvas)
    return canvas


def imshow_det_rbboxes(
    img: np.ndarray,
    rbboxes: np.ndarray,
    labels: np.ndarray,
    scores: Optional[np.ndarray] = None,
    class_names: Optional[Sequence[str]] = None,
    score_thr: float = 0.0,
    thickness: int = 1,
    font_scale: float = 0.35,
    out_file: Optional[str] = None,
) -> np.ndarray:
    """Draw rotated (cx, cy, w, h, angle-rad) boxes as polygons."""
    import cv2

    canvas = np.ascontiguousarray(np.clip(img, 0, 255).astype(np.uint8))
    rbboxes = np.asarray(rbboxes).reshape(-1, 5)
    labels = np.asarray(labels).reshape(-1)
    if scores is not None:
        scores = np.asarray(scores).reshape(-1)
        keep = scores >= score_thr
        rbboxes, labels, scores = rbboxes[keep], labels[keep], scores[keep]
    for i, (cx, cy, w, h, ang) in enumerate(rbboxes):
        col = _color(labels[i])
        pts = cv2.boxPoints(((float(cx), float(cy)), (float(w), float(h)),
                             float(np.degrees(ang))))
        cv2.polylines(canvas, [pts.astype(np.int32)], True, col, thickness)
        name = (class_names[int(labels[i])] if class_names is not None
                else f"cls{int(labels[i])}")
        text = f"{name}|{scores[i]:.2f}" if scores is not None else name
        cv2.putText(canvas, text, (int(cx - w / 2), max(int(cy - h / 2) - 2, 8)),
                    cv2.FONT_HERSHEY_SIMPLEX, font_scale, col, 1, cv2.LINE_AA)
    if out_file:
        os.makedirs(os.path.dirname(os.path.abspath(out_file)), exist_ok=True)
        cv2.imwrite(out_file, canvas)
    return canvas
