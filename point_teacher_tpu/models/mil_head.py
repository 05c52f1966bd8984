"""MIL (multiple-instance) head towers: per-stage reg + bag-classifier FC stacks.

Capability target: fcos_head_p2b_ts.py:212-263 (_init_layers MIL part) and the
forward paths in mil_bag_extensive (:1182, reg tower -> fc_reg) and
mil_bag_classifier (:1240, bag tower -> fc_cls / fc_ins). Each tower is
2 x Linear(flatten(7*7*256) -> 1024) + ReLU. The reference also creates
fc_iou and shared_fcs/shared_fcs_refine that are never exercised on the
shipped Point-Teacher path; they are intentionally not replicated.

TPU note: all proposals of a batch are flattened into one [N, 12544] matmul —
MXU-shaped by construction.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

Array = jnp.ndarray


class _FCTower(nn.Module):
    fc_out: int = 1024
    num_fcs: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = x.reshape(x.shape[0], -1).astype(self.dtype)
        for i in range(self.num_fcs):
            h = nn.relu(nn.Dense(self.fc_out, dtype=self.dtype, name=f"fc{i}")(h))
        return h


class MILHead(nn.Module):
    """Stage-indexed MIL towers. Call with roi feats [N, 7, 7, C]."""

    num_classes: int
    num_stages: int = 1
    fc_out: int = 1024
    dtype: Any = jnp.float32

    def setup(self):
        self.reg_towers = [_FCTower(self.fc_out, dtype=self.dtype, name=f"reg_tower{s}")
                           for s in range(self.num_stages)]
        self.bag_towers = [_FCTower(self.fc_out, dtype=self.dtype, name=f"bag_tower{s}")
                           for s in range(self.num_stages)]
        self.fc_reg = [nn.Dense(4, dtype=jnp.float32, name=f"fc_reg{s}")
                       for s in range(self.num_stages)]
        self.fc_cls = [nn.Dense(self.num_classes, dtype=jnp.float32, name=f"fc_cls{s}")
                       for s in range(self.num_stages)]
        self.fc_ins = [nn.Dense(self.num_classes, dtype=jnp.float32, name=f"fc_ins{s}")
                       for s in range(self.num_stages)]

    def regress(self, roi_feats: Array, stage: int) -> Array:
        """[N, 7, 7, C] -> bbox deltas [N, 4]."""
        return self.fc_reg[stage](self.reg_towers[stage](roi_feats))

    def classify(self, roi_feats: Array, stage: int):
        """[N, 7, 7, C] -> (cls_score [N, num_classes], ins_score [N, num_classes])."""
        h = self.bag_towers[stage](roi_feats)
        return self.fc_cls[stage](h), self.fc_ins[stage](h)

    def classify_neg(self, roi_feats: Array, stage: int) -> Array:
        h = self.bag_towers[stage](roi_feats)
        return self.fc_cls[stage](h)

    def __call__(self, roi_feats: Array, stage: int = 0):
        # convenience for initialization: touch every tower
        outs = []
        for s in range(self.num_stages):
            outs.append((self.regress(roi_feats, s),) + self.classify(roi_feats, s))
        return outs
