"""Feature Pyramid Network (flax, NHWC).

Capability target: HBB_TOD/mmdet/models/necks/fpn.py with the Point-Teacher
config (in_channels [256,512,1024,2048], start_level=1, num_outs=5,
add_extra_convs='on_output', relu_before_extra_convs=True —
aitodv2_point_teacher_0%.py:40-47): P3-P5 from C3-C5 laterals + top-down
nearest upsample, P6/P7 from stride-2 convs on the P5 output.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ._resize import resize_nearest as _upsample_nearest_2x

Array = jnp.ndarray


class FPN(nn.Module):
    out_channels: int = 256
    start_level: int = 1
    num_outs: int = 5
    relu_before_extra_convs: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[Array]):
        used = list(inputs[self.start_level:])
        n_lat = len(used)
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name=f"lateral{i}")(used[i])
            for i in range(n_lat)
        ]
        # top-down pathway (nearest upsample, matching mmcv default)
        for i in range(n_lat - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _upsample_nearest_2x(
                laterals[i], laterals[i - 1].shape[1:3]
            )
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name=f"fpn_conv{i}")(laterals[i])
            for i in range(n_lat)
        ]
        # extra levels from the last output ('on_output')
        src = outs[-1]
        for i in range(self.num_outs - n_lat):
            if i > 0 and self.relu_before_extra_convs:
                src = nn.relu(src)
            src = nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding=1,
                          dtype=self.dtype, name=f"extra_conv{i}")(src)
            outs.append(src)
        return tuple(outs)
