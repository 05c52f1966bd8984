"""Point-based top-k label assignment, fully vectorised (no per-GT python loops).

Parity targets:
- TopkAssigner: HBB_TOD/mmdet/core/bbox/assigners/topk_assigner.py:14-147
- FUSETopkAssigner: HBB_TOD/mmdet/core/bbox/assigners/fuse_topk_assigner.py:14-121

Semantics reproduced exactly, including two quirks of the reference:
1. Stage 1 takes the `num_pre` lowest-reg-cost points *per GT column*, so every
   GT always has exactly `num_pre` candidates.
2. Stage 2 (only active when num_pre > topk) ranks each GT's candidates by the
   stage-2 cost *within every GT column* and keeps a candidate if it is in the
   top-k of ANY column (`torch.topk(cost_i, k, dim=0).flatten()` in the
   reference ranks all columns, not just column i).
3. When several GTs claim the same point, the highest GT index wins (the
   reference's ascending-i loop overwrites).

All shapes static; padded GTs are masked via `gt_valid`.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jnp.ndarray
INF = 1e9


@partial(jax.jit, static_argnames=("num_pre", "topk"))
def topk_assign(
    reg_cost: Array,
    stage2_cost: Array,
    gt_valid: Array,
    num_pre: int,
    topk: int,
) -> Array:
    """Generic two-stage top-k assignment.

    reg_cost, stage2_cost: [P, G]; gt_valid: bool [G].
    Returns assigned [P] int32: 0-based GT index, -1 = background.
    """
    p, g = reg_cost.shape
    # stage 1: per-GT num_pre nearest points (invalid GTs get arbitrary
    # candidates; they are masked out of the final assignment).
    _, cand = jax.lax.top_k(-reg_cost.T, num_pre)  # [G, num_pre]

    if num_pre <= topk:
        selected = jnp.ones((g, num_pre), dtype=bool)
    else:
        # stage-2 cost of each candidate against every GT column: [G, J, G]
        cc = stage2_cost[cand]  # gather rows -> [G, J, G]
        # rank of candidate j within column c among g's J candidates,
        # tie-broken by candidate position (torch.topk stability).
        cj = cc[:, :, None, :]   # [G, J, 1, G] — candidate under test
        ck = cc[:, None, :, :]   # [G, 1, K, G] — competitor
        jj = jnp.arange(num_pre)
        tie = jj[None, :] < jj[:, None]  # tie[j, k] == (k < j)
        # earlier[g, j, k, c] == candidate k precedes candidate j in column c
        earlier = (ck < cj) | ((ck == cj) & tie[None, :, :, None])
        rank = earlier.sum(axis=2)  # [G, J, G]
        in_topk = rank < topk
        in_topk = in_topk & gt_valid[None, None, :]
        selected = in_topk.any(axis=-1)  # [G, J]

    gt_ids = jnp.arange(g)[:, None]  # [G, 1]
    vals = jnp.where(selected & gt_valid[:, None], gt_ids, -1)  # [G, J]
    assigned = jnp.full((p,), -1, dtype=jnp.int32)
    assigned = assigned.at[cand.reshape(-1)].max(vals.reshape(-1).astype(jnp.int32))
    return assigned


def labels_from_assignment(assigned: Array, gt_labels: Array, num_classes: int) -> Array:
    """assigned [P] (-1 bg), gt_labels [G] -> labels [P] with bg = num_classes."""
    safe = jnp.clip(assigned, 0, gt_labels.shape[0] - 1)
    return jnp.where(assigned >= 0, gt_labels[safe], num_classes).astype(jnp.int32)
