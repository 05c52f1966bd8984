"""Host-side preprocessing to fixed-shape arrays.

Capability target: the train/test pipelines of
aitodv2_point_teacher_0%.py:180-204 — LoadImageFromFile, Resize(keep_ratio,
(800, 800)), RandomFlip(ratio 0 — a no-op kept for config parity),
Normalize(identity: raw 0-255 pixels reach the model), Pad(size_divisor 32).
Strong augmentation and masking happen inside the train step, not here
(SURVEY.md §2.2 "data pipeline" note).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
from PIL import Image


def load_image(path: str) -> np.ndarray:
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.float32)


def resize_keep_ratio(img: np.ndarray, target: Tuple[int, int]):
    """mmdet Resize(keep_ratio=True): scale = min over dims, bilinear."""
    h, w = img.shape[:2]
    th, tw = target
    scale = min(th / h, tw / w)
    nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
    if (nh, nw) != (h, w):
        img = np.asarray(
            Image.fromarray(img.astype(np.uint8)).resize((nw, nh), Image.BILINEAR),
            dtype=np.float32,
        )
    w_scale = nw / w
    h_scale = nh / h
    return img, np.asarray([w_scale, h_scale, w_scale, h_scale], np.float32)


def pad_to_canvas(img: np.ndarray, canvas: int) -> np.ndarray:
    out = np.zeros((canvas, canvas, img.shape[2]), np.float32)
    out[: img.shape[0], : img.shape[1]] = img
    return out


def preprocess(
    path: str,
    boxes: np.ndarray,
    canvas: int = 800,
):
    """-> (image [canvas,canvas,3] raw pixels, boxes scaled, scale_factor [4])."""
    img = load_image(path)
    img, scale = resize_keep_ratio(img, (canvas, canvas))
    img = pad_to_canvas(img, canvas)
    if boxes is not None and len(boxes):
        boxes = boxes * scale[None]
    return img, boxes, scale


def pad_gts(boxes: np.ndarray, labels: np.ndarray, max_gt: int):
    g = min(len(boxes), max_gt)
    out_b = np.zeros((max_gt, 4), np.float32)
    out_l = np.zeros((max_gt,), np.int32)
    out_v = np.zeros((max_gt,), bool)
    out_b[:g] = boxes[:g]
    out_l[:g] = labels[:g]
    out_v[:g] = True
    return out_b, out_l, out_v
