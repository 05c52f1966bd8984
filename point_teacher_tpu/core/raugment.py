"""Rotated strong augmentation (flip + discrete rescale on rotated boxes).

Capability target: OBB_TOD/mmrotate/models/detectors/syn_images_generator_v2.py
strong_augmentation (:223-360) — the reference flips/rescales corner polygons
and converts back with poly2obb; flipping a rotated box is equivalent to
mirroring its centre and negating the angle (diagonal flip keeps the angle),
with le90 renormalisation.
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


@jax.jit
def strong_augment_rotated(key: Array, batch: RAugBatch) -> RAugBatch:
    b, h, w, _ = batch.image.shape

    def one(key, img, gt_pts, gt_valid, ps_pts, ps_rb, ps_valid):
        k1, k2 = jax.random.split(key)
        direction = jax.random.randint(k1, (), 0, 4)
        u = jax.random.uniform(k2, (), minval=0.8, maxval=1.2)
        s = jnp.round(u * 10.0) / 10.0

        img = _flip_image(img, direction)
        gt_pts = _flip_points(gt_pts, direction, h, w)
        ps_pts = _flip_points(ps_pts, direction, h, w)
        ps_rb = _flip_rboxes(ps_rb, direction, h, w)

        _, _, off_y, off_x = rescale_offsets(s, h, w)
        off = jnp.stack([off_x, off_y])
        img = warp_rescale_image(img, s)
        gt_pts = gt_pts * s + off
        ps_pts = ps_pts * s + off
        ps_rb = ps_rb.at[..., :4].multiply(s).at[..., :2].add(off)

        def inframe(p):
            return ((p[..., 0] >= 0) & (p[..., 0] < w)
                    & (p[..., 1] >= 0) & (p[..., 1] < h))

        return RAugBatch(img, gt_pts, gt_valid & inframe(gt_pts), ps_pts, ps_rb,
                         ps_valid & inframe(ps_pts))

    keys = jax.random.split(key, b)
    return jax.vmap(one)(keys, batch.image, batch.gt_points, batch.gt_valid,
                         batch.pseudo_points, batch.pseudo_rboxes, batch.pseudo_valid)


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
