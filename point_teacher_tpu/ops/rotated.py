"""Rotated-box geometry (pure JAX, static shapes).

Replaces the mmcv-full CUDA ops the reference imports:
- box_iou_rotated  (OBB_TOD/mmrotate/core/bbox/iou_calculators)
- diff_iou_rotated_2d (OBB_TOD/mmrotate/models/losses/rotated_iou_loss.py:11)
- obb2poly_le90 (HBB_TOD/mmdet/models/detectors/data_augument_bank.py:516)
- obb2xyxy (syn_images_generator_v2.py:382)

Rotated IoU is computed with a fully vectorised Sutherland–Hodgman convex
clip + shoelace area — differentiable, no dynamic shapes, maps to the VPU.
Boxes are (cx, cy, w, h, theta) with theta in radians (le90 convention).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def obb2poly(rboxes: Array) -> Array:
    """[..., 5] (cx,cy,w,h,a) -> [..., 8] corner polygon (x0,y0,...,x3,y3).

    Corner order matches the reference's le90 conversion: (tl, tr, br, bl) in
    the box frame rotated by a.
    """
    cx, cy, w, h, a = (rboxes[..., i] for i in range(5))
    dx = w * 0.5
    dy = h * 0.5
    cos, sin = jnp.cos(a), jnp.sin(a)
    # box-frame corners: (-dx,-dy), (dx,-dy), (dx,dy), (-dx,dy)
    xs = jnp.stack([-dx, dx, dx, -dx], axis=-1)
    ys = jnp.stack([-dy, -dy, dy, dy], axis=-1)
    px = cos[..., None] * xs - sin[..., None] * ys + cx[..., None]
    py = sin[..., None] * xs + cos[..., None] * ys + cy[..., None]
    return jnp.stack([px, py], axis=-1).reshape(*rboxes.shape[:-1], 8)


def obb2xyxy(obb: Array) -> Array:
    """Axis-aligned cover of a rotated box, matching syn_images_generator_v2.py:382."""
    w, h, a = obb[..., 2], obb[..., 3], obb[..., 4]
    cosa, sina = jnp.abs(jnp.cos(a)), jnp.abs(jnp.sin(a))
    dw = cosa * w + sina * h
    dh = sina * w + cosa * h
    cx, cy = obb[..., 0], obb[..., 1]
    return jnp.stack([cx - dw / 2, cy - dh / 2, cx + dw / 2, cy + dh / 2], axis=-1)


def points_in_rbox(points: Array, rboxes: Array) -> Array:
    """points [..., P, 2] x rboxes [..., G, 5] -> bool [..., P, G]."""
    d = points[..., :, None, :] - rboxes[..., None, :, :2]  # [..., P, G, 2]
    a = rboxes[..., None, :, 4]
    cos, sin = jnp.cos(a), jnp.sin(a)
    # rotate into box frame (inverse rotation)
    lx = cos * d[..., 0] + sin * d[..., 1]
    ly = -sin * d[..., 0] + cos * d[..., 1]
    return (jnp.abs(lx) <= rboxes[..., None, :, 2] * 0.5) & (
        jnp.abs(ly) <= rboxes[..., None, :, 3] * 0.5
    )


def _poly_area(poly_xy: Array) -> Array:
    """Shoelace area of a closed ring [..., K, 2]. Duplicate (zero-length)
    edges contribute nothing, so masked-duplicate rings are exact."""
    x, y = poly_xy[..., 0], poly_xy[..., 1]
    xn = jnp.roll(x, -1, axis=-1)
    yn = jnp.roll(y, -1, axis=-1)
    return jnp.abs((x * yn - xn * y).sum(-1)) * 0.5


def _fill_ring_duplicates(verts: Array, emit: Array) -> Array:
    """Replace non-emitted slots with their most recent emitted predecessor
    (ring wrap for leading slots). Implemented as an UNROLLED where-scan over
    the (small, static) slot axis — pure elementwise selects, no gathers and
    no sorts (both were the dominant cost of the pairwise rotated IoU)."""
    k = emit.shape[-1]
    # last emitted vertex overall (for the ring wrap of leading slots)
    last = verts[..., 0, :]
    for i in range(k):
        last = jnp.where(emit[..., i, None], verts[..., i, :], last)
    filled = []
    cur = last
    for i in range(k):
        cur = jnp.where(emit[..., i, None], verts[..., i, :], cur)
        filled.append(cur)
    return jnp.stack(filled, axis=-2)


def _clip_poly_halfplane(poly: Array, p0: Array, p1: Array):
    """Clip a closed ring [..., K, 2] (duplicates allowed) against the
    half-plane left of edge p0->p1. Returns a ring [..., 2K, 2]."""
    k = poly.shape[-2]
    cur = poly
    nxt_v = jnp.roll(poly, -1, axis=-2)

    e = p1 - p0  # [..., 2]
    def side(pt):
        d = pt - p0[..., None, :]
        return e[..., None, 0] * d[..., 1] - e[..., None, 1] * d[..., 0]

    s_cur = side(cur)
    s_nxt = side(nxt_v)
    in_cur = s_cur >= 0
    in_nxt = s_nxt >= 0

    denom = s_cur - s_nxt
    t = s_cur / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    inter = cur + t[..., None] * (nxt_v - cur)

    # per input edge emit up to 2 vertices: (cur if inside), (crossing point)
    emit1 = in_cur
    emit2 = in_cur ^ in_nxt
    verts = jnp.stack([cur, inter], axis=-2).reshape(*poly.shape[:-2], 2 * k, 2)
    emits = jnp.stack([emit1, emit2], axis=-1).reshape(*poly.shape[:-2], 2 * k)
    return _fill_ring_duplicates(verts, emits), emits.any(-1)


def rbox_intersection_area(r1: Array, r2: Array) -> Array:
    """Intersection area of two rotated boxes, each [..., 5] -> [...].

    Clips poly(r1) against the 4 edges of poly(r2). Output polygon of two
    clipped quads has <= 8 vertices; we keep 16 slots then measure area.
    """
    p1 = obb2poly(r1).reshape(*r1.shape[:-1], 4, 2)
    p2 = obb2poly(r2).reshape(*r2.shape[:-1], 4, 2)
    poly = p1
    # orient the clipper counter-clockwise by its signed area
    x, y = p2[..., 0], p2[..., 1]
    xn = jnp.roll(x, -1, axis=-1)
    yn = jnp.roll(y, -1, axis=-1)
    signed = (x * yn - xn * y).sum(-1)
    flip = signed < 0
    p2 = jnp.where(flip[..., None, None], p2[..., ::-1, :], p2)

    nonempty = jnp.ones(p1.shape[:-2], dtype=bool)
    for i in range(4):
        p0 = p2[..., i, :]
        p1e = p2[..., (i + 1) % 4, :]
        poly, any_emit = _clip_poly_halfplane(poly, p0, p1e)
        nonempty = nonempty & any_emit
    # the true intersection of two quads has <= 8 vertices; the ring carries
    # duplicates, so the final 64-slot ring is exact under the shoelace
    return _poly_area(poly) * nonempty


def norm_angle_le90(a: Array) -> Array:
    """Normalise angles into [-pi/2, pi/2) (le90 convention)."""
    return (a + jnp.pi / 2) % jnp.pi - jnp.pi / 2


def distance_angle_decode(points: Array, pred5: Array) -> Array:
    """DistanceAnglePointCoder.decode (mmrotate): (l, t, r, b, theta) at
    `points` -> (cx, cy, w, h, theta). Exact distance2obb semantics
    (distance_angle_point_coder.py:93-112): the centre offset
    ((r-l)/2, (b-t)/2) is ROTATED by theta before being added to the point,
    and the returned angle is normalised into le90. (The r3 differential
    parity harness caught the earlier axis-aligned-centre deviation.)"""
    l, t, r, b, a = (pred5[..., i] for i in range(5))
    w = l + r
    h = t + b
    ox = (r - l) * 0.5
    oy = (b - t) * 0.5
    cos, sin = jnp.cos(a), jnp.sin(a)
    cx = points[..., 0] + cos * ox - sin * oy
    cy = points[..., 1] + sin * ox + cos * oy
    return jnp.stack([cx, cy, w, h, norm_angle_le90(a)], axis=-1)


def rbox_ltrb_targets(points: Array, rboxes: Array) -> Array:
    """(l, t, r, b) of each point in each rotated box's frame.

    points [P, 2], rboxes [G, 5] -> [P, G, 4]. Mirrors the rotated FCOS target
    construction (rotated_fcos_head_p2rb_ts.py:690-707): offset rotated into
    the box frame, then w/2 +- ox, h/2 +- oy.
    """
    d = points[:, None, :] - rboxes[None, :, :2]  # [P, G, 2]
    a = rboxes[None, :, 4]
    cos, sin = jnp.cos(a), jnp.sin(a)
    ox = cos * d[..., 0] + sin * d[..., 1]
    oy = -sin * d[..., 0] + cos * d[..., 1]
    w = rboxes[None, :, 2]
    h = rboxes[None, :, 3]
    return jnp.stack([w / 2 + ox, h / 2 + oy, w / 2 - ox, h / 2 - oy], axis=-1)


def rbox_iou(rb1: Array, rb2: Array, aligned: bool = False, eps: float = 1e-6) -> Array:
    """Rotated IoU. Pairwise [M,5]x[N,5]->[M,N]; aligned [M,5]x[M,5]->[M].

    Differentiable (usable as the diff_iou_rotated_2d replacement).
    """
    if not aligned:
        m, n = rb1.shape[-2], rb2.shape[-2]
        r1 = jnp.broadcast_to(rb1[..., :, None, :], (*rb1.shape[:-2], m, n, 5))
        r2 = jnp.broadcast_to(rb2[..., None, :, :], (*rb2.shape[:-2], m, n, 5))
    else:
        r1, r2 = rb1, rb2
    inter = rbox_intersection_area(r1, r2)
    a1 = r1[..., 2] * r1[..., 3]
    a2 = r2[..., 2] * r2[..., 3]
    return inter / jnp.maximum(a1 + a2 - inter, eps)


def rbox_iou_chunked(rb1: Array, rb2: Array, chunk: int = 256, eps: float = 1e-6) -> Array:
    """Pairwise rotated IoU computed in row chunks: the polygon-clip
    intermediates are O(M*N*32) floats, so full [M, N] at once blows memory
    for NMS-sized inputs. [M,5] x [N,5] -> [M,N]."""
    m = rb1.shape[0]
    if m <= chunk:
        return rbox_iou(rb1, rb2, eps=eps)
    pad = (-m) % chunk
    rb1p = jnp.pad(rb1, ((0, pad), (0, 0)), constant_values=1.0)
    blocks = rb1p.reshape(-1, chunk, 5)
    out = jax.lax.map(lambda b: rbox_iou(b, rb2, eps=eps), blocks)
    return out.reshape(-1, rb2.shape[0])[:m]
