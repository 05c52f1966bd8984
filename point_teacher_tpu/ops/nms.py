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
    # raw-score threshold BEFORE the score_factors multiply — mmrotate
    # bbox_nms_rotated.py:49-55 (same rule as the HBB multiclass_nms)
    valid = (scores > score_thr).reshape(-1)
    if score_factors is not None:
        scores = scores * score_factors[:, None]
    boxes_f = jnp.broadcast_to(rboxes[:, None, :], (n, c, 5)).reshape(-1, 5)
    scores_f = scores.reshape(-1)
    labels_f = jnp.broadcast_to(jnp.arange(c)[None, :], (n, c)).reshape(-1)

    # rotated IoU is translation-invariant, so the per-class coordinate-offset
    # trick works on (cx, cy): classes land far apart and never suppress
    max_coord = jnp.max(jnp.where(valid[:, None], jnp.abs(boxes_f[:, :4]), 0.0)) * 2 + 1.0
    off = labels_f.astype(boxes_f.dtype) * max_coord
    boxes_off = boxes_f.at[:, 0].add(off)

    m = boxes_off.shape[0]
    chunk = 2048
    if m <= chunk:
        iou = rbox_iou(boxes_off, boxes_off)
        iou = jnp.where(valid[None] & valid[:, None], iou, 0.0)
        keep = _greedy_suppress(
            iou, jnp.where(valid, scores_f, -jnp.inf), iou_thr, iters=64) & valid
        final_scores = jnp.where(keep, scores_f, -jnp.inf)
        k = min(max_out, m)
        out_scores, sel_idx = jax.lax.top_k(final_scores, k)
    else:
        # full-width exact greedy over all nms_pre*C candidates (see
        # _chunked_class_nms); mirrors mmrotate multiclass_nms_rotated which
        # never caps the candidate set
        k = max_out
        out_scores, sel_idx, _ = _chunked_class_nms(
            boxes_off, scores_f, valid, rbox_iou, iou_thr, max_out,
            chunk, iters=32)
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


def _chunked_class_nms(boxes_iou, scores_f, valid, iou_fn, iou_thr: float,
                       max_out: int, chunk: int, iters: int):
    """Exact full-width greedy NMS over M candidates in score-sorted chunks.

    Equivalence to one-shot greedy over all M candidates: chunks are visited
    in descending score order against a buffer of the top `max_out` kept
    boxes. While the buffer is not full, no kept box has been dropped, so
    suppression is exact; once it IS full, every remaining candidate scores
    below all `max_out` buffered boxes and can never enter the output, so
    any suppression error among them is unobservable. Returns
    (kept_scores [max_out] desc, kept_idx [max_out] into the input arrays,
    kept_valid [max_out]).
    """
    m = boxes_iou.shape[0]
    nchunks = -(-m // chunk)
    pad = nchunks * chunk - m
    scores_m = jnp.where(valid, scores_f, -jnp.inf)
    if pad:
        boxes_iou = jnp.pad(boxes_iou, ((0, pad), (0, 0)))
        scores_m = jnp.pad(scores_m, (0, pad), constant_values=-jnp.inf)
    order = jnp.argsort(-scores_m, stable=True)

    d = boxes_iou.shape[-1]
    kept_scores = jnp.full((max_out,), -jnp.inf, dtype=scores_m.dtype)
    kept_boxes = jnp.zeros((max_out, d), dtype=boxes_iou.dtype)
    kept_idx = jnp.zeros((max_out,), dtype=jnp.int32)
    for ci in range(nchunks):
        sl = order[ci * chunk:(ci + 1) * chunk]
        cb = boxes_iou[sl]
        cs = scores_m[sl]
        dead = ((iou_fn(cb, kept_boxes) > iou_thr)
                & (kept_scores > -jnp.inf)[None]).any(-1)
        alive = (cs > -jnp.inf) & ~dead
        iou = iou_fn(cb, cb)
        iou = jnp.where(alive[None] & alive[:, None], iou, 0.0)
        keep_chunk = _greedy_suppress(
            iou, jnp.where(alive, cs, -jnp.inf), iou_thr, iters=iters) & alive
        merged_scores = jnp.concatenate(
            [kept_scores, jnp.where(keep_chunk, cs, -jnp.inf)])
        merged_boxes = jnp.concatenate([kept_boxes, cb])
        merged_idx = jnp.concatenate([kept_idx, sl.astype(jnp.int32)])
        kept_scores, sel = jax.lax.top_k(merged_scores, max_out)
        kept_boxes = merged_boxes[sel]
        kept_idx = merged_idx[sel]
    return kept_scores, kept_idx, kept_scores > -jnp.inf


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
    # the reference thresholds the RAW class score BEFORE multiplying
    # score_factors (bbox_nms.py: "multiply score_factor after threshold to
    # preserve more bboxes") — a raw score above thr survives even when the
    # centerness-weighted product falls below it
    valid = (scores > score_thr).reshape(-1)
    if score_factors is not None:
        scores = scores * score_factors[:, None]
    boxes_f = jnp.broadcast_to(boxes[:, None, :], (n, c, 4)).reshape(-1, 4)
    scores_f = scores.reshape(-1)
    labels_f = jnp.broadcast_to(jnp.arange(c)[None, :], (n, c)).reshape(-1)

    # class-offset so that boxes of different classes never overlap
    max_coord = jnp.max(jnp.where(valid[:, None], boxes_f, 0.0)) + 1.0
    offsets = labels_f.astype(boxes_f.dtype) * max_coord
    boxes_off = boxes_f + offsets[:, None]

    m = boxes_off.shape[0]
    chunk = 4096
    if m <= chunk:
        # single [M, M] matrix — one-shot greedy
        keep = nms(boxes_off, jnp.where(valid, scores_f, -jnp.inf), iou_thr,
                   valid=valid, iters=64)
        final_scores = jnp.where(keep & valid, scores_f, -jnp.inf)
        k = min(max_out, m)
        out_scores, sel_idx = jax.lax.top_k(final_scores, k)
    else:
        # full-width: ALL nms_pre*C candidates participate, processed in
        # score-sorted chunks (exact — see _chunked_class_nms); closes the
        # round-2 candidate-cap parity hole vs mmdet bbox_nms.py, which runs
        # batched_nms over the full class-expanded set.
        k = max_out
        out_scores, sel_idx, _ = _chunked_class_nms(
            boxes_off, scores_f, valid, bbox_overlaps, iou_thr, max_out,
            chunk, iters=32)
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
