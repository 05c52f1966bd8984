"""Proposal-bag generation for the MIL head (static shapes).

Capability targets in syn_images_generator_v2.py:
- fine_proposals_from_cfg (:262-324, gen_mode='refine'/'fix_gen'): per-box
  (ratio_w x ratio_h) grid with optional 4-way centre shake; validity =
  IoF(proposal, image) > 0.7.
- gen_proposals_from_cfg (:147-231, gen_mode='define'): point-centred
  scale/ratio grid (used by baseline configs, not the shipped PT config).
- gen_negative_proposals (:234-259): random background boxes, weight = max
  IoU with any positive proposal < 0.3.
- MIL_gen_proposals_from_cfg (:134-145): repeats reference/real boxes per bag.

U (bag size) is a static function of the config: len(base_ratios)^2 *
(1 + 4 * len(shake_ratio or ())).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.boxes import bbox_overlaps, cxcywh_to_xyxy, xyxy_to_cxcywh

Array = jnp.ndarray


class FineProposalCfg(NamedTuple):
    base_ratios: Tuple[float, ...] = (1.0,)
    shake_ratio: Optional[Tuple[float, ...]] = None
    min_scale: float = 0.0
    gen_num_neg: int = 0

    @property
    def num_bags(self) -> int:
        r = len(self.base_ratios) ** 2
        return r * (1 + 4 * len(self.shake_ratio or ()))


def fine_proposals(boxes_xyxy: Array, cfg: FineProposalCfg, img_hw) -> Tuple[Array, Array]:
    """boxes [G, 4] -> (proposals [G, U, 4], valid [G, U])."""
    g = boxes_xyxy.shape[0]
    c = xyxy_to_cxcywh(boxes_xyxy)
    wh = jnp.clip(c[:, 2:4], cfg.min_scale, 1000.0)
    ratios = jnp.asarray(
        [(rw, rh) for rw in cfg.base_ratios for rh in cfg.base_ratios],
        dtype=boxes_xyxy.dtype,
    )  # [R2, 2]
    base = jnp.concatenate(
        [
            jnp.broadcast_to(c[:, None, :2], (g, ratios.shape[0], 2)),
            wh[:, None, :] * ratios[None],
        ],
        axis=-1,
    )  # [G, R2, 4] cxcywh
    # member order matches fine_proposals_from_cfg exactly (combo-major:
    # [base, l, r, t, d] per ratio combo — syn_images_generator_v2.py:183-204
    # concatenates on the variant dim then flattens); MIL is permutation-
    # invariant over bag members up to top-k ties, but matching the order
    # removes tie divergence vs the reference
    variants = [base[:, :, None, :]]  # [G, R2, 1, 4]
    for ratio in cfg.shake_ratio or ():
        offs = jnp.asarray(
            [(-ratio, 0.0), (ratio, 0.0), (0.0, -ratio), (0.0, ratio)],
            dtype=boxes_xyxy.dtype,
        )  # [4, 2] multiplies (w, h)
        shift = base[:, :, None, 2:4] * offs[None, None]  # [G, R2, 4, 2]
        ctr = base[:, :, None, :2] + shift
        whx = jnp.broadcast_to(base[:, :, None, 2:4], ctr.shape)
        variants.append(jnp.concatenate([ctr, whx], -1))
    props = cxcywh_to_xyxy(
        jnp.concatenate(variants, axis=2).reshape(g, -1, 4))  # [G, U, 4]
    h, w = img_hw
    img_box = jnp.asarray([[0.0, 0.0, w, h]], dtype=boxes_xyxy.dtype)
    iof = bbox_overlaps(props.reshape(-1, 4), img_box, mode="iof")[:, 0]
    valid = (iof > 0.7).reshape(g, -1)
    return props, valid


def point_proposals(
    points: Array,
    base_scales: Sequence[float],
    base_ratios: Sequence[float],
    shake_ratio: Optional[float],
    img_hw,
    cut_mode: str = "symmetry",
) -> Tuple[Array, Array]:
    """'define' mode: point-centred scale/ratio grid (gen_proposals_from_cfg).

    points [G, 2] -> (proposals [G, U, 4], valid [G, U]) with
    U = len(scales)*len(ratios)*(5 if shake_ratio else 1).
    """
    h, w = img_hw
    g = points.shape[0]
    base = min(w, h) / 100.0
    sizes = jnp.asarray(
        [(s * base * r, s * base / r) for s in base_scales for r in base_ratios],
        dtype=points.dtype,
    )  # [SR, 2]
    sr = sizes.shape[0]
    ctr = jnp.broadcast_to(points[:, None, :], (g, sr, 2))
    size = jnp.broadcast_to(sizes[None], (g, sr, 2))
    if shake_ratio is not None:
        sx = jnp.clip(ctr[..., 0] - shake_ratio * size[..., 0], 1, w - 1)
        sx2 = jnp.clip(ctr[..., 0] + shake_ratio * size[..., 0], 1, w - 1)
        sy = jnp.clip(ctr[..., 1] - shake_ratio * size[..., 1], 1, h - 1)
        sy2 = jnp.clip(ctr[..., 1] + shake_ratio * size[..., 1], 1, h - 1)
        ctrs = jnp.stack(
            [
                ctr,
                jnp.stack([sx, ctr[..., 1]], -1),
                jnp.stack([sx2, ctr[..., 1]], -1),
                jnp.stack([ctr[..., 0], sy], -1),
                jnp.stack([ctr[..., 0], sy2], -1),
            ],
            axis=2,
        )  # [G, SR, 5, 2]
        size = jnp.broadcast_to(size[:, :, None, :], ctrs.shape)
        ctr, size = ctrs.reshape(g, -1, 2), size.reshape(g, -1, 2)
    if cut_mode == "symmetry":
        size_w = jnp.minimum(size[..., 0], 2 * ctr[..., 0])
        size_w = jnp.minimum(size_w, 2 * (w - ctr[..., 0]))
        size_h = jnp.minimum(size[..., 1], 2 * ctr[..., 1])
        size_h = jnp.minimum(size_h, 2 * (h - ctr[..., 1]))
        size = jnp.stack([size_w, size_h], -1)
    props = cxcywh_to_xyxy(jnp.concatenate([ctr, size], -1))
    if cut_mode == "clamp":
        props = props.at[..., 0::2].set(jnp.clip(props[..., 0::2], 0, w))
        props = props.at[..., 1::2].set(jnp.clip(props[..., 1::2], 0, h))
        valid = jnp.ones(props.shape[:-1], bool)
    elif cut_mode == "ignore":
        img_box = jnp.asarray([[0.0, 0.0, w, h]], dtype=points.dtype)
        iof = bbox_overlaps(props.reshape(-1, 4), img_box, mode="iof")[:, 0]
        valid = (iof > 0.7).reshape(props.shape[:-1])
    else:
        valid = jnp.ones(props.shape[:-1], bool)
    return props, valid


def negative_proposals(
    key: Array,
    pos_proposals: Array,
    pos_valid: Array,
    num_neg: int,
    img_hw,
) -> Tuple[Array, Array]:
    """Random background boxes [N, 4] + weight [N] (True when IoU with every
    valid positive proposal < 0.3)."""
    h, w = img_hw
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x1 = jax.random.uniform(k1, (num_neg,)) * w * 0.8
    y1 = jax.random.uniform(k2, (num_neg,)) * h * 0.8
    x2 = x1 + jax.random.uniform(k3, (num_neg,)) * 100.0
    y2 = y1 + jax.random.uniform(k4, (num_neg,)) * 100.0
    neg = jnp.stack([x1, y1, x2, y2], -1)
    iou = bbox_overlaps(neg, pos_proposals.reshape(-1, 4))
    iou = jnp.where(pos_valid.reshape(-1)[None, :], iou, 0.0)
    weight = (iou < 0.3).all(axis=1)
    return neg, weight


def delta_decode(proposals_xyxy: Array, deltas: Array, img_hw, wh_ratio_clip: float = 16 / 1000):
    """DeltaXYWHBBoxCoder.decode with target_means 0 / stds 1
    (mmdet/core/bbox/coder/delta_xywh_bbox_coder.py semantics)."""
    c = xyxy_to_cxcywh(proposals_xyxy)
    max_ratio = jnp.abs(jnp.log(wh_ratio_clip))
    dxy = deltas[..., :2]
    dwh = jnp.clip(deltas[..., 2:4], -max_ratio, max_ratio)
    ctr = c[..., :2] + dxy * c[..., 2:4]
    wh = c[..., 2:4] * jnp.exp(dwh)
    out = cxcywh_to_xyxy(jnp.concatenate([ctr, wh], -1))
    h, w = img_hw
    out = out.at[..., 0::2].set(jnp.clip(out[..., 0::2], 0, w))
    out = out.at[..., 1::2].set(jnp.clip(out[..., 1::2], 0, h))
    return out
