"""Rotated FCOS head: the HBB head + an angle branch.

Capability target: TS_P2RBRotatedFCOSHead conv towers + forward_single
(rotated_fcos_head_p2rb_ts.py:356-387): conv_angle on the reg feature,
optional learnable scale_angle (config scale_angle=True), norm_on_bbox decode.

Unlike the HBB head (whose shipped config sets norm_cfg=None,
conv_bias=True), the SODA-A config leaves the rotated head's norm at the
class default GN(32) with conv_bias='auto' -> the towers are
Conv(bias=False) + GroupNorm(32) + ReLU, and centerness sits on the CLS
feature (centerness_on_reg defaults to False and the config does not set
it). Both were caught by the r3 full-module instantiation parity test.
"""
from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

Array = jnp.ndarray


class RotatedFCOSHead(nn.Module):
    num_classes: int
    feat_channels: int = 256
    stacked_convs: int = 4
    stride: int = 8
    norm_on_bbox: bool = True
    centerness_on_reg: bool = False
    is_scale_angle: bool = True
    tower_gn: bool = True  # GN(32) towers (reference default norm_cfg)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat: Array):
        """feat [B,H,W,C] -> (cls_logits, bbox_pred (pixels), angle_pred,
        centerness)."""
        conv_init = nn.initializers.normal(0.01)
        cls_feat = feat
        reg_feat = feat
        for i in range(self.stacked_convs):
            cls_feat = nn.Conv(self.feat_channels, (3, 3), padding=1,
                               dtype=self.dtype, kernel_init=conv_init,
                               use_bias=not self.tower_gn,
                               name=f"cls_conv{i}")(cls_feat)
            reg_feat = nn.Conv(self.feat_channels, (3, 3), padding=1,
                               dtype=self.dtype, kernel_init=conv_init,
                               use_bias=not self.tower_gn,
                               name=f"reg_conv{i}")(reg_feat)
            if self.tower_gn:
                cls_feat = nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                        dtype=self.dtype,
                                        name=f"cls_gn{i}")(cls_feat)
                reg_feat = nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                        dtype=self.dtype,
                                        name=f"reg_gn{i}")(reg_feat)
            cls_feat = nn.relu(cls_feat)
            reg_feat = nn.relu(reg_feat)
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
        angle_pred = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype,
                             kernel_init=conv_init, name="conv_angle")(reg_feat)

        scale = self.param("scale", nn.initializers.ones, ())
        bbox_pred = (bbox_pred * scale).astype(jnp.float32)
        if self.norm_on_bbox:
            bbox_pred = jnp.clip(bbox_pred, 0, None) * self.stride
        else:
            bbox_pred = jnp.exp(bbox_pred)
        if self.is_scale_angle:
            angle_scale = self.param("scale_angle", nn.initializers.ones, ())
            angle_pred = angle_pred * angle_scale
        return (cls_score.astype(jnp.float32), bbox_pred,
                angle_pred.astype(jnp.float32), centerness.astype(jnp.float32))
