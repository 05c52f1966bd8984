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


def rescale_offsets(s, h, w):
    """Paste/crop offsets of the reference's two-step rescale (resize to
    (int(h*s), int(w*s)) then centre pad/crop), as traced values.

    off > 0 pastes into a black canvas (s < 1); off < 0 crops (s > 1).
    """
    sh = jnp.floor(h * s + 1e-4)
    sw = jnp.floor(w * s + 1e-4)
    off_y = jnp.trunc((h - sh) / 2)
    off_x = jnp.trunc((w - sw) / 2)
    return sh, sw, off_y, off_x


def warp_rescale_image(img, s):
    """Single bilinear warp equivalent to resize(align_corners=False) +
    centre pad/crop for ANY scale — replaces a lax.switch over the discrete
    scales (all branches would be computed under vmap).

    dst (y, x) samples src ((y - off + .5)/s - .5, ...) masked to the pasted
    region; border samples clamp like jax.image.resize.
    """
    h, w, c = img.shape
    sh, sw, off_y, off_x = rescale_offsets(s, h, w)

    def axis_coords(n, off, sn):
        # effective resize scale is floor(n*s)/n (resize to an integer size),
        # NOT s itself — matches F.interpolate(size=...) / jax.image.resize
        d = jnp.arange(n, dtype=img.dtype)
        rel = d - off
        src = (rel + 0.5) * (n / sn) - 0.5
        valid = (rel >= 0) & (rel < sn)
        return jnp.clip(src, 0, n - 1), valid

    sy, vy = axis_coords(h, off_y, sh)
    sx, vx = axis_coords(w, off_x, sw)
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    ly = (sy - y0)[:, None, None]
    lx = (sx - x0)[None, :, None]
    y0i = y0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, h - 1)
    x0i = x0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)
    top = img[y0i][:, x0i] * (1 - lx) + img[y0i][:, x1i] * lx
    bot = img[y1i][:, x0i] * (1 - lx) + img[y1i][:, x1i] * lx
    out = top * (1 - ly) + bot * ly
    mask = (vy[:, None] & vx[None, :])[..., None]
    return jnp.round(jnp.where(mask, out, 0.0))


def _rescale(img, pts_list, boxes, s, h, w):
    """Traced-scale rescale of image, point sets and xyxy boxes.

    Matches the reference semantics exactly for the 5 discrete scales
    (coords scaled then shifted by the paste/crop offsets; points leaving the
    frame on upscale get inframe=False).
    """
    sh, sw, off_y, off_x = rescale_offsets(s, h, w)
    off = jnp.stack([off_x, off_y])
    out = warp_rescale_image(img, s)
    new_pts = [p * s + off for p in pts_list]
    inframe = [
        (p[..., 0] >= 0) & (p[..., 0] < w) & (p[..., 1] >= 0) & (p[..., 1] < h)
        for p in new_pts
    ]
    boxes = boxes * s
    boxes = boxes.at[..., 0::2].add(off_x).at[..., 1::2].add(off_y)
    return out, new_pts, boxes, inframe


@jax.jit
def strong_augment(key: Array, batch: AugBatch) -> AugBatch:
    b, h, w, _ = batch.image.shape

    def one(key, img, gt_pts, gt_valid, ps_pts, ps_boxes, ps_valid):
        k1, k2 = jax.random.split(key)
        direction = jax.random.randint(k1, (), 0, 4)
        # np.around(U(0.8, 1.2), 1) -> nearest of the 5 discrete scales
        u = jax.random.uniform(k2, (), minval=0.8, maxval=1.2)
        s = jnp.round(u * 10.0) / 10.0

        img, (gt_pts, ps_pts), ps_boxes = _flip(img, [gt_pts, ps_pts], ps_boxes, direction, h, w)
        img, (gt_pts, ps_pts), ps_boxes, (gt_in, ps_in) = _rescale(
            img, [gt_pts, ps_pts], ps_boxes, s, h, w
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
