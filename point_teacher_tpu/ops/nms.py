"""NMS (horizontal + rotated) in pure XLA with static shapes.

Replaces mmcv's CUDA `nms`, `batched_nms`, `nms_rotated` used by the reference
(test-time multiclass NMS: mmdet/core/post_processing/bbox_nms.py; synthetic
box de-overlap: syn_images_generator_v2.py:504,667).

Greedy NMS is a sequential algorithm; we express it as a `lax.fori_loop` over
score-sorted candidates where each step suppresses an IoU row — O(N) vector
steps of width N, which XLA schedules well on the VPU for N <= a few thousand.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .boxes import bbox_overlaps
from .rotated import rbox_iou

Array = jnp.ndarray


def _greedy_suppress(iou: Array, order_scores: Array, iou_thr: float,
                     iters: int | None = None) -> Array:
    """Given a pairwise IoU matrix [N, N] and scores, return keep mask [N],
    matching torch/mmcv greedy NMS (descending-score visit order).

    iters=None runs the exact sequential loop (N while-loop steps — fine off
    the hot path). An integer runs the PARALLEL greedy fixpoint: each round,
    every still-undecided box that no higher-priority undecided/kept box
    overlaps becomes kept, and everything a newly-kept box overlaps dies.
    This equals sequential greedy once the suppression-chain depth is reached
    (a handful of rounds in practice); a (normally zero-trip) while loop
    finishes any chain deeper than `iters`, so the result is ALWAYS exact.
    Each round is pure [N, N] matrix work — no sequential while-loop overhead
    on TPU for the common case.
    """
    n = iou.shape[0]
    if iters is not None:
        # strict priority: higher score first, ties by lower index (stable)
        idx = jnp.arange(n)
        rank = jnp.argsort(jnp.argsort(-order_scores, stable=True), stable=True)
        higher = rank[None, :] < rank[:, None]  # j outranks i
        conflict = higher & (iou > iou_thr)  # j can suppress i

        overlap = iou > iou_thr

        def round_fn(carry):
            alive, keep = carry
            sup_by_alive = (conflict & alive[None, :]).any(-1)
            newly = alive & ~sup_by_alive
            keep = keep | newly
            dead = (overlap & newly[None, :] & higher).any(-1)
            alive = alive & ~newly & ~dead
            return alive, keep

        # UNROLLED python loop: per-iteration dispatch of lax loops costs
        # ~ms on this backend, dwarfing the [N, N] boolean math itself
        carry = (jnp.ones(n, dtype=bool), jnp.zeros(n, dtype=bool))
        for _ in range(iters):
            carry = round_fn(carry)
        # exactness guard: each round decides >= 1 box while any is alive, so
        # this loop is zero-trip unless a suppression chain exceeds `iters`
        carry = jax.lax.while_loop(lambda c: c[0].any(), round_fn, carry)
        return carry[1]

    order = jnp.argsort(-order_scores, stable=True)
    iou_sorted = iou[order][:, order]

    def body(i, keep):
        alive = keep[i]
        row = iou_sorted[i]
        sup = row > iou_thr
        # only suppress later boxes
        later = jnp.arange(n) > i
        keep = jnp.where(alive & later & sup, False, keep)
        return keep

    keep_sorted = jax.lax.fori_loop(0, n, body, jnp.ones(n, dtype=bool))
    keep = jnp.zeros(n, dtype=bool).at[order].set(keep_sorted)
    return keep


def nms(boxes: Array, scores: Array, iou_thr: float, valid=None,
        iters: int | None = 64) -> Array:
    """Horizontal NMS. boxes [N,4] xyxy, scores [N] -> keep mask [N]."""
    iou = bbox_overlaps(boxes, boxes, mode="iou")
    if valid is not None:
        scores = jnp.where(valid, scores, -jnp.inf)
        iou = jnp.where(valid[None] & valid[:, None], iou, 0.0)
    keep = _greedy_suppress(iou, scores, iou_thr, iters=iters)
    if valid is not None:
        keep = keep & valid
    return keep


def nms_rotated(rboxes: Array, scores: Array, iou_thr: float, valid=None,
                iters: int | None = 32) -> Array:
    """Rotated NMS. rboxes [N,5] (cx,cy,w,h,a), scores [N] -> keep mask [N]."""
    iou = rbox_iou(rboxes, rboxes)
    if valid is not None:
        scores = jnp.where(valid, scores, -jnp.inf)
        iou = jnp.where(valid[None] & valid[:, None], iou, 0.0)
    keep = _greedy_suppress(iou, scores, iou_thr, iters=iters)
    if valid is not None:
        keep = keep & valid
    return keep


@partial(jax.jit, static_argnames=("max_out", "iou_thr", "score_thr"))
def multiclass_nms_rotated(
    rboxes: Array,
    scores: Array,
    score_thr: float,
    iou_thr: float,
    max_out: int,
    score_factors: Array | None = None,
):
    """Class-wise rotated NMS over [N, 5] rboxes and [N, C] scores.

    Mirrors mmrotate multiclass_nms_rotated (bbox_nms_rotated.py): per-class
    suppression (cross-class IoU masked to 0 — the rotated analog of the
    coordinate-offset trick), fixed-shape output (dets [max_out, 6]
    (cx,cy,w,h,a,score), labels, valid).
    """
    n, c = scores.shape
    if score_factors is not None:
        scores = scores * score_factors[:, None]
    boxes_f = jnp.broadcast_to(rboxes[:, None, :], (n, c, 5)).reshape(-1, 5)
    scores_f = scores.reshape(-1)
    labels_f = jnp.broadcast_to(jnp.arange(c)[None, :], (n, c)).reshape(-1)
    valid = scores_f > score_thr

    cap = min(boxes_f.shape[0], max(2048, max_out))
    top_scores, top_idx = jax.lax.top_k(jnp.where(valid, scores_f, -jnp.inf), cap)
    top_boxes = boxes_f[top_idx]
    top_labels = labels_f[top_idx]
    iou = rbox_iou(top_boxes, top_boxes)
    same = top_labels[:, None] == top_labels[None, :]
    iou = jnp.where(same & (top_scores[None] > -jnp.inf) & (top_scores[:, None] > -jnp.inf),
                    iou, 0.0)
    keep = _greedy_suppress(iou, top_scores, iou_thr, iters=64) & (top_scores > -jnp.inf)

    final_scores = jnp.where(keep, top_scores, -jnp.inf)
    k = min(max_out, cap)
    out_scores, sel = jax.lax.top_k(final_scores, k)
    sel_idx = top_idx[sel]
    out_valid = out_scores > -jnp.inf
    out_scores = jnp.where(out_valid, out_scores, 0.0)
    dets = jnp.concatenate([boxes_f[sel_idx], out_scores[:, None]], axis=-1)
    out_labels = jnp.where(out_valid, labels_f[sel_idx], -1)
    if k < max_out:
        pad = max_out - k
        dets = jnp.pad(dets, ((0, pad), (0, 0)))
        out_labels = jnp.pad(out_labels, (0, pad), constant_values=-1)
        out_valid = jnp.pad(out_valid, (0, pad))
    return dets, out_labels, out_valid


@partial(jax.jit, static_argnames=("max_out", "iou_thr", "score_thr"))
def multiclass_nms(
    boxes: Array,
    scores: Array,
    score_thr: float,
    iou_thr: float,
    max_out: int,
    score_factors: Array | None = None,
):
    """Class-wise NMS over [N, 4] boxes and [N, C] foreground scores.

    Mirrors mmdet `multiclass_nms` (bbox_nms.py): filter by score_thr,
    class-offset trick for per-class NMS, return top `max_out` detections as
    fixed-shape (dets [max_out, 5], labels [max_out], valid [max_out]).
    """
    n, c = scores.shape
    if score_factors is not None:
        scores = scores * score_factors[:, None]
    boxes_f = jnp.broadcast_to(boxes[:, None, :], (n, c, 4)).reshape(-1, 4)
    scores_f = scores.reshape(-1)
    labels_f = jnp.broadcast_to(jnp.arange(c)[None, :], (n, c)).reshape(-1)
    valid = scores_f > score_thr

    # class-offset so that boxes of different classes never overlap
    max_coord = jnp.max(jnp.where(valid[:, None], boxes_f, 0.0)) + 1.0
    offsets = labels_f.astype(boxes_f.dtype) * max_coord
    boxes_off = boxes_f + offsets[:, None]

    # cap the candidate set to keep the O(N^2) IoU matrix bounded:
    # keep the top `cap` candidates by score (others can't make max_out anyway
    # only if cap >= max_out; we use cap = max(4096, max_out)).
    cap = min(boxes_off.shape[0], max(4096, max_out))
    top_scores, top_idx = jax.lax.top_k(jnp.where(valid, scores_f, -jnp.inf), cap)
    keep = nms(boxes_off[top_idx], top_scores, iou_thr, valid=top_scores > -jnp.inf,
               iters=64)

    final_scores = jnp.where(keep, top_scores, -jnp.inf)
    k = min(max_out, cap)
    out_scores, sel = jax.lax.top_k(final_scores, k)
    sel_idx = top_idx[sel]
    out_valid = out_scores > -jnp.inf
    out_scores = jnp.where(out_valid, out_scores, 0.0)
    dets = jnp.concatenate([boxes_f[sel_idx], out_scores[:, None]], axis=-1)
    out_labels = jnp.where(out_valid, labels_f[sel_idx], -1)
    if k < max_out:
        pad = max_out - k
        dets = jnp.pad(dets, ((0, pad), (0, 0)))
        out_labels = jnp.pad(out_labels, (0, pad), constant_values=-1)
        out_valid = jnp.pad(out_valid, (0, pad))
    return dets, out_labels, out_valid
