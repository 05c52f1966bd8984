"""Strong augmentation (random 4-way flip + discrete rescale), batched on device.

Capability target: strong_augmentation (syn_images_generator_v2.py:24-132).
The reference's per-image host loop becomes a vmapped `lax.switch` over the
4 flip variants and the 5 discrete scale factors (np.around(U(0.8,1.2), 1)
only ever produces {0.8, 0.9, 1.0, 1.1, 1.2} — static shapes for free).

Out-of-frame points after an upscale are masked invalid rather than filtered
(ragged -> masked).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray

SCALES = (0.8, 0.9, 1.0, 1.1, 1.2)


class AugBatch(NamedTuple):
    image: Array          # [B, H, W, 3]
    gt_points: Array      # [B, G, 2]
    gt_valid: Array       # [B, G]
    pseudo_points: Array  # [B, G, 2]
    pseudo_boxes: Array   # [B, G, 4] xyxy
    pseudo_valid: Array   # [B, G]


def _flip(img, pts_list, boxes, direction, h, w):
    """direction: 0 horizontal, 1 vertical, 2 diagonal, 3 none."""
    def fh(img, pts, boxes):
        return (
            img[:, ::-1, :],
            [p.at[..., 0].set(w - p[..., 0]) for p in pts],
            boxes.at[..., 0::2].set(w - boxes[..., 0::2]),
        )

    def fv(img, pts, boxes):
        return (
            img[::-1, :, :],
            [p.at[..., 1].set(h - p[..., 1]) for p in pts],
            boxes.at[..., 1::2].set(h - boxes[..., 1::2]),
        )

    def fd(img, pts, boxes):
        img2, pts2, boxes2 = fh(img, pts, boxes)
        return fv(img2, pts2, boxes2)

    def fn(img, pts, boxes):
        return img, list(pts), boxes

    return jax.lax.switch(direction, [fh, fv, fd, fn], img, pts_list, boxes)


def _rescale(img, pts_list, boxes, scale_idx, h, w):
    """Rescale by SCALES[scale_idx] with centre crop (s>1) or centre pad (s<1).

    Returns (img, pts_list, boxes, inframe_fn) where inframe_fn(points)
    gives the validity of transformed points (always True for s <= 1).
    """

    def branch(s):
        sh, sw = int(h * s), int(w * s)

        def run(img, pts, boxes):
            pts = [p * s for p in pts]
            boxes = boxes * s
            resized = jax.image.resize(img, (sh, sw, img.shape[-1]), method="bilinear")
            if s < 1.0:
                by, bx = (h - sh) // 2, (w - sw) // 2
                out = jnp.zeros_like(img)
                out = jax.lax.dynamic_update_slice(out, resized, (by, bx, 0))
                pts = [p.at[..., 0].add(bx).at[..., 1].add(by) for p in pts]
                boxes = boxes.at[..., 0::2].add(bx).at[..., 1::2].add(by)
                inframe = [jnp.ones(p.shape[:-1], bool) for p in pts]
            elif s > 1.0:
                by, bx = (sh - h) // 2, (sw - w) // 2
                out = jax.lax.dynamic_slice(resized, (by, bx, 0), (h, w, img.shape[-1]))
                inframe = [
                    (p[..., 0] >= bx) & (p[..., 0] < w + bx)
                    & (p[..., 1] >= by) & (p[..., 1] < h + by)
                    for p in pts
                ]
                pts = [p.at[..., 0].add(-bx).at[..., 1].add(-by) for p in pts]
                boxes = boxes.at[..., 0::2].add(-bx).at[..., 1::2].add(-by)
            else:
                out = resized
                inframe = [jnp.ones(p.shape[:-1], bool) for p in pts]
            return jnp.round(out), pts, boxes, inframe

        return run

    branches = [branch(s) for s in SCALES]
    return jax.lax.switch(scale_idx, branches, img, pts_list, boxes)


@jax.jit
def strong_augment(key: Array, batch: AugBatch) -> AugBatch:
    b, h, w, _ = batch.image.shape

    def one(key, img, gt_pts, gt_valid, ps_pts, ps_boxes, ps_valid):
        k1, k2 = jax.random.split(key)
        direction = jax.random.randint(k1, (), 0, 4)
        # np.around(U(0.8, 1.2), 1) -> nearest of the 5 discrete scales
        s = jax.random.uniform(k2, (), minval=0.8, maxval=1.2)
        scale_idx = jnp.round((s - 0.8) * 10).astype(jnp.int32)

        img, (gt_pts, ps_pts), ps_boxes = _flip(img, [gt_pts, ps_pts], ps_boxes, direction, h, w)
        img, (gt_pts, ps_pts), ps_boxes, (gt_in, ps_in) = _rescale(
            img, [gt_pts, ps_pts], ps_boxes, scale_idx, h, w
        )
        # normalise flipped boxes (x1<x2, y1<y2) — the reference's "bboxes refine"
        x1 = jnp.minimum(ps_boxes[..., 0], ps_boxes[..., 2])
        x2 = jnp.maximum(ps_boxes[..., 0], ps_boxes[..., 2])
        y1 = jnp.minimum(ps_boxes[..., 1], ps_boxes[..., 3])
        y2 = jnp.maximum(ps_boxes[..., 1], ps_boxes[..., 3])
        ps_boxes = jnp.stack([x1, y1, x2, y2], -1)
        return AugBatch(
            image=img,
            gt_points=gt_pts,
            gt_valid=gt_valid & gt_in,
            pseudo_points=ps_pts,
            pseudo_boxes=ps_boxes,
            pseudo_valid=ps_valid & ps_in,
        )

    keys = jax.random.split(key, b)
    return jax.vmap(one)(keys, batch.image, batch.gt_points, batch.gt_valid,
                         batch.pseudo_points, batch.pseudo_boxes, batch.pseudo_valid)


def random_point_in_boxes(key: Array, boxes_xyxy: Array, position: float) -> Array:
    """Sample the annotation point uniformly inside the central `position`
    fraction of each box (data_augument_bank.py:1471-1494). position=0 ->
    exact centre."""
    wh = boxes_xyxy[..., 2:4] - boxes_xyxy[..., 0:2]
    space = wh * (1 - position) / 2
    u = jax.random.uniform(key, boxes_xyxy[..., :2].shape)
    return boxes_xyxy[..., 0:2] + space + u * wh * position
