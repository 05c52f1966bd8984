"""Device-side rasterisation of rotated rectangles.

Replaces the reference's per-iteration host round trip
(`cv2.fillPoly` in generate_black_paper, syn_images_generator_v2.py:678-688)
with a vectorised point-in-rotated-rect test evaluated on the TPU. Row blocks
are processed with `lax.map` to bound live memory at H/BLK * (BLK*W*G) bools.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jnp.ndarray


@partial(jax.jit, static_argnames=("height", "width", "row_block"))
def rasterize_rboxes(
    rboxes: Array,
    valid: Array,
    height: int,
    width: int,
    row_block: int = 64,
) -> Array:
    """rboxes [G, 5] (cx, cy, w, h, a), valid [G] -> bool mask [H, W].

    A pixel (ix, iy) is inside if its integer coordinate lies within any valid
    rotated rect (matching cv2.fillPoly's integer-grid fill closely enough for
    the synthetic masking use case).
    """
    g = rboxes.shape[0]
    cx, cy = rboxes[:, 0], rboxes[:, 1]
    hw = rboxes[:, 2] * 0.5
    hh = rboxes[:, 3] * 0.5
    a = rboxes[:, 4]
    cos, sin = jnp.cos(a), jnp.sin(a)

    xs = jnp.arange(width, dtype=rboxes.dtype)

    def one_block(y0):
        ys = y0 + jnp.arange(row_block, dtype=rboxes.dtype)
        dx = xs[None, :, None] - cx[None, None, :]  # [1, W, G]
        dy = ys[:, None, None] - cy[None, None, :]  # [BLK, 1, G]
        lx = cos[None, None] * dx + sin[None, None] * dy
        ly = -sin[None, None] * dx + cos[None, None] * dy
        inside = (jnp.abs(lx) <= hw[None, None]) & (jnp.abs(ly) <= hh[None, None])
        inside = inside & valid[None, None]
        return inside.any(-1)  # [BLK, W]

    nblocks = -(-height // row_block)
    y0s = jnp.arange(nblocks, dtype=rboxes.dtype) * row_block
    mask = jax.lax.map(one_block, y0s)  # [nblocks, BLK, W]
    return mask.reshape(nblocks * row_block, width)[:height]
