"""Pure-functional train state for the teacher-student pair.

The reference keeps the teacher as a second module plus mutable python dicts
for the per-image point caches and a step counter
(fcos_p2b_teacher_student.py:60-74). Here everything is one pytree:
- teacher params are an EMA twin of the student tree (update_teacher_model
  :254-257 becomes a tree_map);
- the per-image point caches (gt_bboxes_point / refined_gt_bboxes_point dicts
  keyed by filename) become dense [num_images, G, 2] arrays indexed by an
  integer image id, updated with .at[].set inside the jitted step — and unlike
  the reference they are checkpointable (SURVEY.md §5 gotcha).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import flax.struct
import jax
import jax.numpy as jnp

Array = jnp.ndarray


class Batch(NamedTuple):
    """Fixed-shape training batch."""

    image: Array       # [B, H, W, 3] float32, raw 0-255 pixels
    gt_boxes: Array    # [B, G, 4] xyxy (used for point sampling + diagnostics)
    gt_labels: Array   # [B, G] int32
    gt_valid: Array    # [B, G] bool
    image_ids: Array   # [B] int32 index into the point caches


@flax.struct.dataclass
class TrainState:
    step: Array
    params: Any
    teacher_params: Any
    opt_state: Any
    origin_points: Array    # [N_images, G, 2]
    refined_points: Array   # [N_images, G, 2]
    points_cached: Array    # [N_images] bool
    rng: Array


def create_train_state(params, tx, num_images: int, max_gt: int, rng) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        teacher_params=jax.tree_util.tree_map(jnp.copy, params),
        opt_state=tx.init(params),
        origin_points=jnp.zeros((num_images, max_gt, 2), jnp.float32),
        refined_points=jnp.zeros((num_images, max_gt, 2), jnp.float32),
        points_cached=jnp.zeros((num_images,), bool),
        rng=rng,
    )


def ema_update(teacher_params, student_params, alpha: float):
    """t <- alpha * t + (1 - alpha) * s (fcos_p2b_teacher_student.py:254-257)."""
    return jax.tree_util.tree_map(
        lambda t, s: t * alpha + s.astype(t.dtype) * (1 - alpha),
        teacher_params, student_params,
    )
