"""Single-stage detector assembly: ResNet -> FPN -> PSAGG -> FCOS head + MIL.

Capability target: Student_FCOS (HBB_TOD/mmdet/models/detectors/fcos_student.py)
with the neck_agg plumbing of single_stage.py:18-44. One flax module holds the
whole student; the teacher is the same module applied with EMA'd params
(pure-functional twin — no second parameter registry as in the reference).

`mil_stack_conv=0` in the shipped config makes forward_mil the identity
(fcos_head_p2b_ts.py:1084-1090), so the MIL feature is the PSAGG output.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .fcos_head import FCOSHead
from .fpn import FPN
from .mil_head import MILHead
from .psagg import PSAGG
from .resnet import ResNet

Array = jnp.ndarray


class StudentFCOS(nn.Module):
    num_classes: int = 8
    depth: int = 50
    backbone_style: str = "caffe"
    feat_channels: int = 256
    stride: int = 8
    num_stages: int = 1
    mil_stack_conv: int = 0
    frozen_stages: int = -1  # mirror cfg.optim.frozen_stages to skip frozen backward
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.backbone = ResNet(depth=self.depth, style=self.backbone_style,
                               frozen_stages=self.frozen_stages, dtype=self.dtype)
        self.neck = FPN(out_channels=self.feat_channels, dtype=self.dtype)
        self.neck_agg = PSAGG(num_aggregation=5, out_channels=self.feat_channels,
                              dtype=self.dtype)
        self.bbox_head = FCOSHead(
            num_classes=self.num_classes,
            feat_channels=self.feat_channels,
            stride=self.stride,
            dtype=self.dtype,
        )
        self.mil_head = MILHead(num_classes=self.num_classes, num_stages=self.num_stages,
                                dtype=self.dtype)
        if self.mil_stack_conv > 0:
            self.mil_convs = [
                nn.Conv(self.feat_channels, (3, 3), padding=1, dtype=self.dtype,
                        name=f"mil_conv{i}")
                for i in range(self.mil_stack_conv)
            ]

    def extract_feat(self, img: Array) -> Array:
        """img [B, H, W, 3] (raw 0-255 pixels — identity normalisation is part
        of the Point-Teacher recipe, config aitodv2_point_teacher_0%.py:176-177)
        -> stride-8 feature [B, H/8, W/8, C]."""
        feats = self.backbone(img)
        feats = self.neck(feats)
        (feat,) = self.neck_agg(feats)
        return feat

    def forward_mil(self, feat: Array) -> Array:
        if self.mil_stack_conv == 0:
            return feat
        h = feat
        for conv in self.mil_convs:
            h = nn.relu(conv(h))
        return h

    def head(self, feat: Array):
        return self.bbox_head(feat)

    def __call__(self, img: Array):
        """Full dense forward: (cls_logits, bbox_pred, centerness), stride-8 feat."""
        feat = self.extract_feat(img)
        cls_score, bbox_pred, centerness = self.bbox_head(feat)
        return (cls_score, bbox_pred, centerness), feat

    # --- sub-apply helpers (used with nn.apply(method=...)) ---
    def mil_regress(self, roi_feats, stage: int):
        return self.mil_head.regress(roi_feats, stage)

    def mil_classify(self, roi_feats, stage: int):
        return self.mil_head.classify(roi_feats, stage)

    def mil_classify_neg(self, roi_feats, stage: int):
        return self.mil_head.classify_neg(roi_feats, stage)

    def init_all(self, img: Array, roi_feats: Array):
        """Touch every submodule once so `init` creates all params."""
        (cls_score, bbox_pred, centerness), feat = self(img)
        mil_feat = self.forward_mil(feat)
        outs = self.mil_head(roi_feats)
        return cls_score, mil_feat, outs
