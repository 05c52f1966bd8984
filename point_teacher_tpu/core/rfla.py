"""RFLA hierarchical label assignment (Gaussian receptive-field based).

Capability target: HBB_TOD/mmdet/core/bbox/assigners/hierarchical_assigner.py
(HieAssigner — inherited from the mmdet-rfla fork base; present in the
reference but not on the Point-Teacher training path, SURVEY.md §2.2 "RFLA
extras"). Two ranking passes over a Gaussian similarity (Wasserstein or KL,
ops/tiny_metrics.py) between anchors and GTs, the second on `ratio`-rescaled
anchors; positives from pass 1 survive, pass-2 fills the rest; optional
centre-inside-gt filter.

Vectorised: the reference's per-(gt, k) value-equality loop is a per-gt top-k
with later-GT-wins (scatter max), matching its ascending overwrite order.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.tiny_metrics import kl_similarity, wasserstein_similarity

Array = jnp.ndarray


class HieAssignerCfg(NamedTuple):
    assign_metric: str = "kl"
    topk: Tuple[int, int] = (2, 1)
    ratio: float = 1.0
    inside: bool = False


def _metric(gt: Array, anchors: Array, mode: str) -> Array:
    if mode == "wd":
        return wasserstein_similarity(gt, anchors)
    return kl_similarity(gt, anchors, mode=mode if mode.startswith("kl") else "kl")


def _assign_ranking(overlaps: Array, gt_valid: Array, k: int) -> Array:
    """overlaps [G, N] -> assigned [N] (0-based, -1 = background).

    bg when an anchor's best similarity < 0.8 (assign_wrt_ranking semantics);
    then each GT claims its top-k anchors, later GTs overwriting earlier.
    """
    g, n = overlaps.shape
    overlaps = jnp.where(gt_valid[:, None], overlaps, -jnp.inf)
    _, cand = jax.lax.top_k(overlaps, min(k, n))  # [G, k]
    gt_ids = jnp.broadcast_to(jnp.arange(g)[:, None], cand.shape)
    vals = jnp.where(gt_valid[:, None], gt_ids, -1)
    assigned = jnp.full((n,), -1, jnp.int32)
    assigned = assigned.at[cand.reshape(-1)].max(vals.reshape(-1).astype(jnp.int32))
    return assigned


def _rescale(anchors: Array, ratio: float) -> Array:
    c = (anchors[:, :2] + anchors[:, 2:4]) / 2
    wh = (anchors[:, 2:4] - anchors[:, :2]) * ratio / 2
    return jnp.concatenate([c - wh, c + wh], -1)


@partial(jax.jit, static_argnames=("cfg",))
def hierarchical_assign(
    anchors: Array,      # [N, 4] xyxy (priors / effective receptive fields)
    gt_bboxes: Array,    # [G, 4] xyxy
    gt_valid: Array,     # [G]
    cfg: HieAssignerCfg = HieAssignerCfg(),
) -> Array:
    """Returns assigned [N]: 0-based gt index, -1 background."""
    ov1 = _metric(gt_bboxes, anchors, cfg.assign_metric)
    a1 = _assign_ranking(ov1, gt_valid, cfg.topk[0])
    ov2 = _metric(gt_bboxes, _rescale(anchors, cfg.ratio), cfg.assign_metric)
    a2 = _assign_ranking(ov2, gt_valid, cfg.topk[1])
    # pass-1 positives survive; pass 2 fills the rest (reassign merge)
    assigned = jnp.where(a1 >= 0, a1, a2)

    if cfg.inside:
        cx = (anchors[:, 0] + anchors[:, 2]) / 2
        cy = (anchors[:, 1] + anchors[:, 3]) / 2
        safe = jnp.clip(assigned, 0, gt_bboxes.shape[0] - 1)
        g = gt_bboxes[safe]
        inside = ((cx > g[:, 0]) & (cx < g[:, 2]) & (cy > g[:, 1]) & (cy < g[:, 3]))
        assigned = jnp.where(inside | (assigned < 0), assigned, -1)
    return assigned
