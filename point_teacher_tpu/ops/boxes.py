"""Horizontal-box geometry ops (pure JAX, static shapes).

Behavioral parity targets (semantics, not code) in the reference:
- bbox_cxcywh_to_xyxy / bbox_xyxy_to_cxcywh:
  HBB_TOD/mmdet/core/bbox/transforms.py
- distance2bbox / bbox2distance: HBB_TOD/mmdet/core/bbox/transforms.py
- bbox_overlaps (modes iou/iof/giou, aligned & pairwise):
  HBB_TOD/mmdet/core/bbox/iou_calculators/iou2d_calculator.py
"""
from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def cxcywh_to_xyxy(b: Array) -> Array:
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([cx - w * 0.5, cy - h * 0.5, cx + w * 0.5, cy + h * 0.5], axis=-1)


def xyxy_to_cxcywh(b: Array) -> Array:
    x1, y1, x2, y2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], axis=-1)


def box_center(b_xyxy: Array) -> Array:
    return (b_xyxy[..., :2] + b_xyxy[..., 2:4]) * 0.5


def distance2bbox(points: Array, distances: Array, max_shape=None) -> Array:
    """Decode (l, t, r, b) distances at `points` into xyxy boxes.

    points: [..., 2], distances: [..., 4]. Mirrors mmdet `distance2bbox`.
    """
    x1 = points[..., 0] - distances[..., 0]
    y1 = points[..., 1] - distances[..., 1]
    x2 = points[..., 0] + distances[..., 2]
    y2 = points[..., 1] + distances[..., 3]
    if max_shape is not None:
        h, w = max_shape[0], max_shape[1]
        x1 = jnp.clip(x1, 0, w)
        y1 = jnp.clip(y1, 0, h)
        x2 = jnp.clip(x2, 0, w)
        y2 = jnp.clip(y2, 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def bbox2distance(points: Array, bbox_xyxy: Array, max_dis=None, eps: float = 0.1) -> Array:
    left = points[..., 0] - bbox_xyxy[..., 0]
    top = points[..., 1] - bbox_xyxy[..., 1]
    right = bbox_xyxy[..., 2] - points[..., 0]
    bottom = bbox_xyxy[..., 3] - points[..., 1]
    d = jnp.stack([left, top, right, bottom], axis=-1)
    if max_dis is not None:
        d = jnp.clip(d, 0, max_dis - eps)
    return d


def _area(b: Array) -> Array:
    return jnp.clip(b[..., 2] - b[..., 0], 0, None) * jnp.clip(b[..., 3] - b[..., 1], 0, None)


def bbox_overlaps(
    bboxes1: Array,
    bboxes2: Array,
    mode: str = "iou",
    is_aligned: bool = False,
    eps: float = 1e-6,
) -> Array:
    """IoU / IoF / GIoU between xyxy boxes.

    Pairwise: bboxes1 [..., M, 4] x bboxes2 [..., N, 4] -> [..., M, N].
    Aligned:  bboxes1 [..., M, 4] x bboxes2 [..., M, 4] -> [..., M].
    """
    assert mode in ("iou", "iof", "giou")
    area1 = _area(bboxes1)
    area2 = _area(bboxes2)
    if not is_aligned:
        b1 = bboxes1[..., :, None, :]
        b2 = bboxes2[..., None, :, :]
        area1 = area1[..., :, None]
        area2 = area2[..., None, :]
    else:
        b1, b2 = bboxes1, bboxes2

    lt = jnp.maximum(b1[..., :2], b2[..., :2])
    rb = jnp.minimum(b1[..., 2:4], b2[..., 2:4])
    wh = jnp.clip(rb - lt, 0, None)
    overlap = wh[..., 0] * wh[..., 1]

    if mode == "iof":
        union = area1
    else:
        union = area1 + area2 - overlap
    union = jnp.maximum(union, eps)
    ious = overlap / union
    if mode in ("iou", "iof"):
        return ious

    enc_lt = jnp.minimum(b1[..., :2], b2[..., :2])
    enc_rb = jnp.maximum(b1[..., 2:4], b2[..., 2:4])
    enc_wh = jnp.clip(enc_rb - enc_lt, 0, None)
    enc_area = jnp.maximum(enc_wh[..., 0] * enc_wh[..., 1], eps)
    return ious - (enc_area - union) / enc_area


def clip_boxes(b_xyxy: Array, h, w) -> Array:
    x = jnp.clip(b_xyxy[..., 0::2], 0, w)
    y = jnp.clip(b_xyxy[..., 1::2], 0, h)
    out = jnp.zeros_like(b_xyxy)
    out = out.at[..., 0::2].set(x)
    out = out.at[..., 1::2].set(y)
    return out


def grid_points(feat_h: int, feat_w: int, stride: int, dtype=jnp.float32) -> Array:
    """Stride-spaced grid point centers, matching the reference ordering
    (row-major over (y, x), offset stride // 2).

    Reference: fcos_head_p2b_ts.py:1007-1017 (_get_points_single).
    """
    ys = jnp.arange(feat_h, dtype=dtype) * stride + stride // 2
    xs = jnp.arange(feat_w, dtype=dtype) * stride + stride // 2
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)
