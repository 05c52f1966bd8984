"""Rotated strong augmentation (flip + random rotate + discrete rescale).

Capability target: OBB_TOD/mmrotate/models/detectors/syn_images_generator_v2.py
strong_augmentation (:223-360) — the reference converts to corner polygons,
flips, rotates by a random 1-19 degree angle (TF.rotate on the image, the
R(-angle) matrix on coordinates, insider filter after), rescales, and
converts back with poly2obb_le90. Operating analytically on (cx,cy,w,h,a) is
equivalent: flips mirror the centre and negate the angle (diagonal keeps it),
rigid rotation adds the rotation to the angle, and the final poly2obb_le90
round trip is the w>=h long-edge-angle canonicalisation (_canon_le90).
Differential-tested against the reference's own function in
tests/test_reference_parity_aug.py.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.rotated import norm_angle_le90
from .augment import SCALES, rescale_offsets, warp_rescale_image

Array = jnp.ndarray


class RAugBatch(NamedTuple):
    image: Array          # [B, H, W, 3]
    gt_points: Array      # [B, G, 2]
    gt_valid: Array       # [B, G]
    pseudo_points: Array  # [B, G, 2]
    pseudo_rboxes: Array  # [B, G, 5]
    pseudo_valid: Array   # [B, G]


def _flip_rboxes(rb, direction, h, w):
    cx, cy, bw, bh, a = (rb[..., i] for i in range(5))

    def fh(_):
        return jnp.stack([w - cx, cy, bw, bh, norm_angle_le90(-a)], -1)

    def fv(_):
        return jnp.stack([cx, h - cy, bw, bh, norm_angle_le90(-a)], -1)

    def fd(_):
        return jnp.stack([w - cx, h - cy, bw, bh, a], -1)

    def fn(_):
        return rb

    return jax.lax.switch(direction, [fh, fv, fd, fn], None)


def _flip_points(p, direction, h, w):
    def fh(_):
        return p.at[..., 0].set(w - p[..., 0])

    def fv(_):
        return p.at[..., 1].set(h - p[..., 1])

    def fd(_):
        return jnp.stack([w - p[..., 0], h - p[..., 1]], -1)

    def fn(_):
        return p

    return jax.lax.switch(direction, [fh, fv, fd, fn], None)


def _flip_image(img, direction):
    return jax.lax.switch(
        direction,
        [lambda x: x[:, ::-1], lambda x: x[::-1], lambda x: x[::-1, ::-1], lambda x: x],
        img,
    )


def _rotate_coords(p, rad, h, w):
    """R(rad) about the image centre (w/2, h/2) — the reference's coordinate
    law for its random-rotate step (syn_images_generator_v2.py OBB :267-281,
    radians = deg2rad(-angle))."""
    cx, cy = w / 2.0, h / 2.0
    cos, sin = jnp.cos(rad), jnp.sin(rad)
    x = p[..., 0] - cx
    y = p[..., 1] - cy
    return jnp.stack([cos * x - sin * y + cx, sin * x + cos * y + cy], -1)


def _rotate_image_nearest(img, rad_inv, h, w):
    """TF.rotate(img, angle, fill=0) analog: NEAREST inverse warp about the
    (w/2, h/2) centre (torchvision's default interpolation and center).
    `rad_inv` is the INVERSE map's rotation (= +angle in radians when the
    points move by R(-angle))."""
    cx, cy = w / 2.0, h / 2.0
    cos, sin = jnp.cos(rad_inv), jnp.sin(rad_inv)
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=img.dtype) + 0.5,
                          jnp.arange(w, dtype=img.dtype) + 0.5, indexing="ij")
    xr = xx - cx
    yr = yy - cy
    sx = cos * xr - sin * yr + cx - 0.5
    sy = sin * xr + cos * yr + cy - 0.5
    xi = jnp.round(sx).astype(jnp.int32)
    yi = jnp.round(sy).astype(jnp.int32)
    valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    out = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
    return jnp.where(valid[..., None], out, 0.0)


def rotate_images_nearest(imgs: Array, rad_invs: Array) -> Array:
    """Batched `_rotate_image_nearest`: one flat gather for the whole batch.

    Identical math (same round/clip/fill-0 law — equivalence pinned by
    tests/test_augment.py); restructured because the per-image 2D advanced
    index under vmap lowers to a ~15 ms/img TPU gather at 1200px, while a
    single batch-flattened `jnp.take` runs ~9.7 ms/img (r4 micro-bench) —
    the rotate gather was 60 of the 64 ms rotated strong-aug cost.
    """
    b, h, w, _ = imgs.shape
    cx, cy = w / 2.0, h / 2.0
    cos = jnp.cos(rad_invs)[:, None, None]
    sin = jnp.sin(rad_invs)[:, None, None]
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=imgs.dtype) + 0.5,
                          jnp.arange(w, dtype=imgs.dtype) + 0.5, indexing="ij")
    xr = (xx - cx)[None]
    yr = (yy - cy)[None]
    sx = cos * xr - sin * yr + cx - 0.5
    sy = sin * xr + cos * yr + cy - 0.5
    xi = jnp.round(sx).astype(jnp.int32)
    yi = jnp.round(sy).astype(jnp.int32)
    valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    flat = (jnp.arange(b, dtype=jnp.int32)[:, None, None] * (h * w)
            + jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1))
    out = jnp.take(imgs.reshape(b * h * w, -1), flat.reshape(-1),
                   axis=0).reshape(imgs.shape)
    return jnp.where(valid[..., None], out, 0.0)


def _canon_le90(rb):
    """poly2obb_le90 canonical form (transforms.py:301-331): w = long edge,
    h = short edge, angle along the long edge, normalised to [-pi/2, pi/2).
    The reference's obb2poly -> poly2obb round trip applies this to every
    pseudo box each step. (Exact-square tie: the reference picks the pt1->pt4
    edge's angle; the rectangle is identical either way.)"""
    swap = rb[..., 3] > rb[..., 2]
    w2 = jnp.where(swap, rb[..., 3], rb[..., 2])
    h2 = jnp.where(swap, rb[..., 2], rb[..., 3])
    a2 = norm_angle_le90(jnp.where(swap, rb[..., 4] + jnp.pi / 2, rb[..., 4]))
    return jnp.concatenate([rb[..., :2], w2[..., None], h2[..., None],
                            a2[..., None]], -1)


@jax.jit
def strong_augment_rotated(key: Array, batch: RAugBatch) -> RAugBatch:
    b, h, w, _ = batch.image.shape
    keys = jax.random.split(key, b)

    def draws(k):
        k1, k2, k3 = jax.random.split(k, 3)
        direction = jax.random.randint(k1, (), 0, 4)
        u = jax.random.uniform(k2, (), minval=0.8, maxval=1.2)
        s = jnp.round(u * 10.0) / 10.0
        # random rotate (OBB-only step, :262-291): angle ~ randint(1, 20)
        angle = jax.random.randint(k3, (), 1, 20).astype(batch.image.dtype)
        return direction, s, angle

    dirs, scales, angles = jax.vmap(draws)(keys)
    rads = -angles * (jnp.pi / 180.0)

    # image path: flip -> rotate -> rescale. The rotate runs batch-level
    # (rotate_images_nearest: one flat gather — the vmapped 2D index was the
    # dominant aug cost); flip and the separable rescale stay vmapped.
    imgs = jax.vmap(_flip_image)(batch.image, dirs)
    imgs = rotate_images_nearest(imgs, -rads)
    imgs = jax.vmap(warp_rescale_image)(imgs, scales)

    def one(direction, s, rad, gt_pts, gt_valid, ps_pts, ps_rb, ps_valid):
        def inframe(p):
            return ((p[..., 0] >= 0) & (p[..., 0] < w)
                    & (p[..., 1] >= 0) & (p[..., 1] < h))

        gt_pts = _flip_points(gt_pts, direction, h, w)
        ps_pts = _flip_points(ps_pts, direction, h, w)
        ps_rb = _flip_rboxes(ps_rb, direction, h, w)

        # coordinates move by R(deg2rad(-angle)) about the centre;
        # TF.rotate(+angle, fill=0) on the image; insider filter after
        gt_pts = _rotate_coords(gt_pts, rad, h, w)
        ps_pts = _rotate_coords(ps_pts, rad, h, w)
        ps_rb = jnp.concatenate(
            [_rotate_coords(ps_rb[..., :2], rad, h, w), ps_rb[..., 2:4],
             (ps_rb[..., 4] + rad)[..., None]], -1)
        gt_valid = gt_valid & inframe(gt_pts)
        ps_valid = ps_valid & inframe(ps_pts)

        _, _, off_y, off_x = rescale_offsets(s, h, w)
        off = jnp.stack([off_x, off_y])
        gt_pts = gt_pts * s + off
        ps_pts = ps_pts * s + off
        ps_rb = ps_rb.at[..., :4].multiply(s).at[..., :2].add(off)
        # the reference's final poly2obb_le90 canonicalises every pseudo box
        ps_rb = _canon_le90(ps_rb)

        return (gt_pts, gt_valid & inframe(gt_pts), ps_pts, ps_rb,
                ps_valid & inframe(ps_pts))

    gt_pts, gt_valid, ps_pts, ps_rb, ps_valid = jax.vmap(one)(
        dirs, scales, rads, batch.gt_points, batch.gt_valid,
        batch.pseudo_points, batch.pseudo_rboxes, batch.pseudo_valid)
    return RAugBatch(imgs, gt_pts, gt_valid, ps_pts, ps_rb, ps_valid)


def random_point_in_rboxes(key: Array, rboxes: Array, position) -> Array:
    """Sample annotation points inside rotated boxes.

    position='center' (or 0.0) -> exact centres (the SODA-A config's
    _point_='center'); float f in (0, 1] -> uniform in the central f fraction
    of the rotated box (the OBB random_point_in_quadrilateral analog).
    """
    if position in ("center", 0.0, 0):
        return rboxes[..., :2]
    frac = 1.0 if position == "random" else float(position)
    u = (jax.random.uniform(key, rboxes[..., :2].shape) - 0.5) * frac
    dx = u[..., 0] * rboxes[..., 2]
    dy = u[..., 1] * rboxes[..., 3]
    a = rboxes[..., 4]
    cos, sin = jnp.cos(a), jnp.sin(a)
    px = rboxes[..., 0] + cos * dx - sin * dy
    py = rboxes[..., 1] + sin * dx + cos * dy
    return jnp.stack([px, py], -1)
