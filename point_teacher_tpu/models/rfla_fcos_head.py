"""RFLA FCOS: multi-level anchor-free head with receptive-field label assignment.

Capability target: HBB_TOD/mmdet/models/dense_heads/rfla_fcos_head.py:30
(RFLA_FCOSHead) — a standard 5-level FCOS head whose target assignment
replaces the regress-range rule with the RFLA hierarchical assigner
(hierarchical_assigner.py) run on each point's theoretical-receptive-field
box (gen_trf, rfla_fcos_head.py:697-731). The reference registers the head
but ships no config for it; defaults here mirror the class defaults
(center_sampling=False, norm_on_bbox=False -> exp decode, GN(32) towers,
fpn_layer='p3', fraction=1/3, HieAssigner kl/topk=(2,1)).

TPU re-design notes:
- towers are shared across levels and applied to the level stack; per-level
  learnable Scale as in the reference;
- `_get_target_single`'s assigned-mask + min-area reduction collapses to a
  direct label gather: the assigner gives each point at most one GT, so the
  masked area-min simply recovers that GT (noted inline at the call site);
- everything is padded/vmapped — no per-image python loops.
"""
from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.rfla import HieAssignerCfg, hierarchical_assign
from ..ops.boxes import bbox2distance, grid_points
from .fpn import FPN
from .resnet import ResNet

Array = jnp.ndarray


def gen_trf() -> Tuple[int, ...]:
    """Theoretical receptive fields of P2..P7 for ResNet-50-FPN
    (rfla_fcos_head.py:697-731): (35, 91, 267, 427, 555, 811)."""
    j = [2 ** i for i in range(8)]
    r1 = 1 + (7 - 1) * j[0]
    r2 = r1 + (3 - 1) * j[1]
    trf_p2 = r2 + (3 - 1) * j[2] * 3
    r3 = trf_p2 + (3 - 1) * j[2]
    trf_p3 = r3 + (3 - 1) * j[3] * 3
    r4 = trf_p3 + (3 - 1) * j[3]
    trf_p4 = r4 + (3 - 1) * j[4] * 5
    r5 = trf_p4 + (3 - 1) * j[4]
    trf_p5 = r5 + (3 - 1) * j[5] * 2
    trf_p6 = trf_p5 + (3 - 1) * j[6]
    trf_p7 = trf_p6 + (3 - 1) * j[7]
    return (trf_p2, trf_p3, trf_p4, trf_p5, trf_p6, trf_p7)


def level_points_and_rfields(img_size: int, strides: Sequence[int],
                             fpn_layer: str = "p3", fraction: float = 1 / 3):
    """Per-level grid points and their receptive-field boxes.

    Returns (points [P, 2], rfields [P, 4], level_sizes list, stride_of_point
    [P]) concatenated over levels (rfla_fcos_head.py:526-584)."""
    trfs = gen_trf()
    pts, rfs, sizes, strs = [], [], [], []
    for num, stride in enumerate(strides):
        feat = int(math.ceil(img_size / stride))
        p = grid_points(feat, feat, stride)
        rfnum = num + 1 if fpn_layer == "p3" else num
        rf = trfs[min(rfnum, len(trfs) - 1)] * fraction
        half = rf / 2.0
        rfield = jnp.concatenate([p - half, p + half], axis=-1)
        pts.append(p)
        rfs.append(rfield)
        sizes.append(feat)
        strs.append(jnp.full((feat * feat,), float(stride)))
    return (jnp.concatenate(pts, 0), jnp.concatenate(rfs, 0), sizes,
            jnp.concatenate(strs, 0))


def rfla_targets(points: Array, rfields: Array, gt_boxes: Array,
                 gt_labels: Array, gt_valid: Array, num_classes: int,
                 assigner: HieAssignerCfg = HieAssignerCfg()):
    """Single-image RFLA targets: labels [P] (num_classes = bg) and (l,t,r,b)
    targets [P, 4] (rfla_fcos_head.py:629-689).

    The reference masks the per-(point, gt) area matrix to the assigned GT and
    takes the min — since the hierarchical assigner yields at most one GT per
    point, that reduction just recovers the assigned GT, so we gather
    directly."""
    assigned = hierarchical_assign(rfields, gt_boxes, gt_valid, assigner)
    safe = jnp.clip(assigned, 0, gt_boxes.shape[0] - 1)
    labels = jnp.where(assigned >= 0, gt_labels[safe], num_classes)
    tgts = bbox2distance(points, gt_boxes[safe])
    return labels, tgts


class RFLAFCOSHead(nn.Module):
    """Shared-tower multi-level FCOS head with GN and per-level scales."""

    num_classes: int
    feat_channels: int = 256
    stacked_convs: int = 4
    num_levels: int = 5
    norm_on_bbox: bool = False
    centerness_on_reg: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[Array], strides: Sequence[int]):
        conv_init = nn.initializers.normal(0.01)
        # shared tower parameters, applied per level (reference shares the
        # tower across levels too — one nn.ModuleList indexed by branch)
        cls_convs = [nn.Conv(self.feat_channels, (3, 3), padding=1, use_bias=False,
                             dtype=self.dtype, kernel_init=conv_init,
                             name=f"cls_conv{i}") for i in range(self.stacked_convs)]
        cls_gns = [nn.GroupNorm(num_groups=32, name=f"cls_gn{i}")
                   for i in range(self.stacked_convs)]
        reg_convs = [nn.Conv(self.feat_channels, (3, 3), padding=1, use_bias=False,
                             dtype=self.dtype, kernel_init=conv_init,
                             name=f"reg_conv{i}") for i in range(self.stacked_convs)]
        reg_gns = [nn.GroupNorm(num_groups=32, name=f"reg_gn{i}")
                   for i in range(self.stacked_convs)]
        bias_init = nn.initializers.constant(-math.log((1 - 0.01) / 0.01))
        conv_cls = nn.Conv(self.num_classes, (3, 3), padding=1, dtype=self.dtype,
                           kernel_init=conv_init, bias_init=bias_init, name="conv_cls")
        conv_reg = nn.Conv(4, (3, 3), padding=1, dtype=self.dtype,
                           kernel_init=conv_init, name="conv_reg")
        conv_ctr = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype,
                           kernel_init=conv_init, name="conv_centerness")
        scales = self.param("scales", nn.initializers.ones, (self.num_levels,))

        outs = []
        for lvl, (x, stride) in enumerate(zip(feats, strides)):
            cls_feat = reg_feat = x
            for conv, gn in zip(cls_convs, cls_gns):
                cls_feat = nn.relu(gn(conv(cls_feat)))
            for conv, gn in zip(reg_convs, reg_gns):
                reg_feat = nn.relu(gn(conv(reg_feat)))
            cls_score = conv_cls(cls_feat).astype(jnp.float32)
            bbox_pred = conv_reg(reg_feat).astype(jnp.float32) * scales[lvl]
            ctr_src = reg_feat if self.centerness_on_reg else cls_feat
            centerness = conv_ctr(ctr_src).astype(jnp.float32)
            if self.norm_on_bbox:
                bbox_pred = jnp.clip(bbox_pred, 0, None) * stride
            else:
                bbox_pred = jnp.exp(bbox_pred)
            outs.append((cls_score, bbox_pred, centerness))
        return outs


class RFLAFCOS(nn.Module):
    """ResNet + FPN(P3-P7) + RFLAFCOSHead — the plain multi-level detector the
    RFLA head belongs to (no PSAGG single-level collapse)."""

    num_classes: int = 8
    depth: int = 50
    backbone_style: str = "caffe"
    feat_channels: int = 256
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    frozen_stages: int = -1
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNet(depth=self.depth, style=self.backbone_style,
                               frozen_stages=self.frozen_stages, dtype=self.dtype)
        self.neck = FPN(out_channels=self.feat_channels, dtype=self.dtype)
        self.bbox_head = RFLAFCOSHead(num_classes=self.num_classes,
                                      feat_channels=self.feat_channels,
                                      num_levels=len(self.strides),
                                      dtype=self.dtype)

    def __call__(self, img: Array):
        feats = self.neck(self.backbone(img))
        return self.bbox_head(feats, self.strides)

    def flatten_outs(self, outs):
        """Per-level (cls, bbox, ctr) -> flattened [B, P, *] over all levels."""
        b = outs[0][0].shape[0]
        cls_f = jnp.concatenate(
            [o[0].reshape(b, -1, self.num_classes) for o in outs], axis=1)
        bbox_f = jnp.concatenate([o[1].reshape(b, -1, 4) for o in outs], axis=1)
        ctr_f = jnp.concatenate([o[2].reshape(b, -1) for o in outs], axis=1)
        return cls_f, bbox_f, ctr_f
