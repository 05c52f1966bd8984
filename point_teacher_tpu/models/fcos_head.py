"""FCOS-style dense head (single stride-8 level on the Point-Teacher path).

Capability target: TS_P2BFCOSHead conv towers —
fcos_head_p2b_ts.py:189-211 (+ anchor_free_head.py:198-219 forward_single):
4 stacked 3x3 convs per branch (bias=True, norm_cfg=None in the shipped
config), conv_cls / conv_reg / conv_centerness (centerness_on_reg=True),
learnable per-level Scale, and norm_on_bbox=True decode
(relu(bbox_pred) * stride). Outputs NHWC maps; flattening to points is done
by the caller (points are row-major (y, x), matching ops.boxes.grid_points).
"""
from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

Array = jnp.ndarray


class FCOSHead(nn.Module):
    num_classes: int
    feat_channels: int = 256
    stacked_convs: int = 4
    stride: int = 8
    norm_on_bbox: bool = True
    centerness_on_reg: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat: Array):
        """feat [B, H, W, C] -> (cls_logits [B,H,W,num_classes],
        bbox_pred [B,H,W,4] in pixels, centerness [B,H,W,1])."""
        conv_init = nn.initializers.normal(0.01)
        cls_feat = feat
        reg_feat = feat
        for i in range(self.stacked_convs):
            cls_feat = nn.relu(
                nn.Conv(self.feat_channels, (3, 3), padding=1, dtype=self.dtype,
                        kernel_init=conv_init, name=f"cls_conv{i}")(cls_feat)
            )
            reg_feat = nn.relu(
                nn.Conv(self.feat_channels, (3, 3), padding=1, dtype=self.dtype,
                        kernel_init=conv_init, name=f"reg_conv{i}")(reg_feat)
            )
        bias_init = nn.initializers.constant(-math.log((1 - 0.01) / 0.01))
        cls_score = nn.Conv(self.num_classes, (3, 3), padding=1, dtype=self.dtype,
                            kernel_init=conv_init, bias_init=bias_init,
                            name="conv_cls")(cls_feat)
        # small positive bias: with norm_on_bbox the prediction is
        # relu-clipped, and a spike can otherwise kill a distance channel
        # permanently (zero gradient below 0) when training from scratch
        bbox_pred = nn.Conv(4, (3, 3), padding=1, dtype=self.dtype,
                            kernel_init=conv_init,
                            bias_init=nn.initializers.constant(0.1),
                            name="conv_reg")(reg_feat)
        ctr_src = reg_feat if self.centerness_on_reg else cls_feat
        centerness = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype,
                             kernel_init=conv_init, name="conv_centerness")(ctr_src)

        scale = self.param("scale", nn.initializers.ones, ())
        bbox_pred = (bbox_pred * scale).astype(jnp.float32)
        if self.norm_on_bbox:
            bbox_pred = jnp.clip(bbox_pred, 0, None) * self.stride
        else:
            bbox_pred = jnp.exp(bbox_pred)
        return cls_score.astype(jnp.float32), bbox_pred, centerness.astype(jnp.float32)
