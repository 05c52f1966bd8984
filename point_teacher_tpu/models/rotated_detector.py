"""Rotated single-stage detector: ResNet -> FPN -> PSAGG -> rotated head + MIL.

Capability target: RotatedFCOS_Student
(OBB_TOD/mmrotate/models/detectors/rotated_fcos_student.py) with the SODA-A
config (sodaa_fcos_pointteacher_1x.py: pytorch-style backbone with trainable
BN affine, ImageNet normalisation handled in the data pipeline).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .fpn import FPN
from .mil_head import MILHead
from .psagg import PSAGG
from .resnet import ResNet
from .rotated_head import RotatedFCOSHead

Array = jnp.ndarray


class StudentRotatedFCOS(nn.Module):
    num_classes: int = 9
    depth: int = 50
    backbone_style: str = "pytorch"
    feat_channels: int = 256
    stride: int = 8
    num_stages: int = 1
    mil_stack_conv: int = 0
    frozen_stages: int = -1  # mirror cfg.optim.frozen_stages to skip frozen backward
    tower_gn: bool = True  # GN(32) head towers (reference default norm_cfg)
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.backbone = ResNet(depth=self.depth, style=self.backbone_style,
                               frozen_stages=self.frozen_stages, dtype=self.dtype)
        self.neck = FPN(out_channels=self.feat_channels, dtype=self.dtype)
        self.neck_agg = PSAGG(num_aggregation=5, out_channels=self.feat_channels,
                              dtype=self.dtype)
        self.bbox_head = RotatedFCOSHead(
            num_classes=self.num_classes, feat_channels=self.feat_channels,
            stride=self.stride, tower_gn=self.tower_gn, dtype=self.dtype,
        )
        self.mil_head = MILHead(num_classes=self.num_classes, num_stages=self.num_stages,
                                dtype=self.dtype)

    def extract_feat(self, img: Array) -> Array:
        feats = self.backbone(img)
        feats = self.neck(feats)
        (feat,) = self.neck_agg(feats)
        return feat

    def head(self, feat: Array):
        return self.bbox_head(feat)

    def __call__(self, img: Array):
        feat = self.extract_feat(img)
        cls_score, bbox_pred, angle_pred, centerness = self.bbox_head(feat)
        return (cls_score, bbox_pred, angle_pred, centerness), feat

    def mil_regress(self, roi_feats, stage: int):
        return self.mil_head.regress(roi_feats, stage)

    def mil_classify(self, roi_feats, stage: int):
        return self.mil_head.classify(roi_feats, stage)

    def mil_classify_neg(self, roi_feats, stage: int):
        return self.mil_head.classify_neg(roi_feats, stage)

    def init_all(self, img: Array, roi_feats: Array):
        outs, feat = self(img)
        mil = self.mil_head(roi_feats)
        return outs, mil
