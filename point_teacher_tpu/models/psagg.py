"""PSAGG aggregation neck: collapse all FPN levels into the single stride-8 map.

Capability target: HBB_TOD/mmdet/models/necks/ps_fpn.py:9-75 — iterative
top-down upsample-add with a 1x1 conv after each merge, returning a 1-tuple
(the head runs on ONE level, strides=[8]).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ._resize import resize_nearest as _resize_nearest

Array = jnp.ndarray


class PSAGG(nn.Module):
    num_aggregation: int = 5
    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[Array]):
        feats = list(inputs)
        n = self.num_aggregation
        # conv index 0 applies to the top level; then one conv per merge.
        feats[-1] = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                            name="agg_conv0")(feats[-1])
        for i in range(n - 1):
            idx = n - 1 - i
            feats[idx - 1] = feats[idx - 1] + _resize_nearest(
                feats[idx], feats[idx - 1].shape[1:3]
            )
            feats[idx - 1] = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                                     name=f"agg_conv{i + 1}")(feats[idx - 1])
        return (feats[0],)
