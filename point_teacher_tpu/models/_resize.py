"""Nearest-neighbour feature resize shared by FPN / PSAGG.

Matches F.interpolate(mode='nearest') index mapping: src = floor(dst * h / oh).

TPU note: the obvious implementation — integer-array indexing `x[:, iy]` — is
a gather whose transpose (backward) is a scatter-add, which XLA serialises on
TPU; with six upsample-merges per detector pass this showed up in the phase-1
step profile. Every FPN/PSAGG merge upsamples to `oh in {2h-1, 2h}` (stride-2
halving with ceil), where the nearest mapping is exactly `dst // 2`, so the
fast path lowers to repeat (broadcast+reshape) + slice — both with cheap
transposes (reduce / pad). The gather path is kept for arbitrary targets.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def resize_nearest(x: Array, out_hw) -> Array:
    """[B, H, W, C] -> [B, oh, ow, C], nearest-neighbour (torch mapping)."""
    oh, ow = int(out_hw[0]), int(out_hw[1])
    b, h, w, c = x.shape
    if (oh, ow) == (h, w):
        return x
    iy = np.arange(oh) * h // oh
    ix = np.arange(ow) * w // ow
    fast_y = oh <= 2 * h and np.array_equal(iy, np.arange(oh) // 2)
    fast_x = ow <= 2 * w and np.array_equal(ix, np.arange(ow) // 2)
    if fast_y and fast_x:
        y = jnp.repeat(x, 2, axis=1)[:, :oh]
        return jnp.repeat(y, 2, axis=2)[:, :, :ow]
    return x[:, jnp.asarray(iy)][:, :, jnp.asarray(ix)]
