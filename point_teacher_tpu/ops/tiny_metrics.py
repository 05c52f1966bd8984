"""Tiny-object similarity metrics (RFLA family) — IoU substitutes that stay
informative for boxes a few pixels wide.

Capability target: HBB_TOD/mmdet/core/bbox/iou_calculators/metric_calculator.py
(bbox_overlaps modes 'wd', 'kl', 'kl_10', 'exp_kl', 'center_distance2' —
present in the reference from its mmdet-rfla fork base, SURVEY.md §2.2
"RFLA extras"). Boxes are modelled as 2-D Gaussians; similarity is a squashed
Wasserstein distance or KL divergence between them.
"""
from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def _pairwise_parts(b1: Array, b2: Array, eps: float):
    c1 = (b1[..., :, None, :2] + b1[..., :, None, 2:4]) / 2
    c2 = (b2[..., None, :, :2] + b2[..., None, :, 2:4]) / 2
    d = c1 - c2
    w1 = b1[..., :, None, 2] - b1[..., :, None, 0] + eps
    h1 = b1[..., :, None, 3] - b1[..., :, None, 1] + eps
    w2 = b2[..., None, :, 2] - b2[..., None, :, 0] + eps
    h2 = b2[..., None, :, 3] - b2[..., None, :, 1] + eps
    return d, w1, h1, w2, h2


def center_distance2(b1: Array, b2: Array, eps: float = 1e-6) -> Array:
    d, *_ = _pairwise_parts(b1, b2, 0.0)
    return d[..., 0] ** 2 + d[..., 1] ** 2 + eps


def wasserstein_similarity(b1: Array, b2: Array, eps: float = 1e-6) -> Array:
    """'wd': 1 / (1 + W2^2) with Gaussian-box Wasserstein distance."""
    d, w1, h1, w2, h2 = _pairwise_parts(b1, b2, eps)
    center = d[..., 0] ** 2 + d[..., 1] ** 2 + eps
    wh = ((w1 - w2) ** 2 + (h1 - h2) ** 2) / 4
    return 1.0 / (1.0 + center + wh)


def _kl_divergence(b1: Array, b2: Array, eps: float) -> Array:
    d, w1, h1, w2, h2 = _pairwise_parts(b1, b2, eps)
    return (
        w2 ** 2 / w1 ** 2 + h2 ** 2 / h1 ** 2
        + 4 * d[..., 0] ** 2 / w1 ** 2 + 4 * d[..., 1] ** 2 / h1 ** 2
        + jnp.log(w1 ** 2 / w2 ** 2) + jnp.log(h1 ** 2 / h2 ** 2) - 2
    ) / 2


def kl_similarity(b1: Array, b2: Array, eps: float = 1e-6, mode: str = "kl") -> Array:
    """'kl' -> 1/(1+KL); 'kl_10' -> 1/(10+KL); 'exp_kl' -> exp(-KL/10)."""
    kl = _kl_divergence(b1, b2, eps)
    if mode == "kl":
        return 1.0 / (1.0 + kl)
    if mode == "kl_10":
        return 1.0 / (10.0 + kl)
    if mode == "exp_kl":
        return jnp.exp(-kl / 10.0)
    raise ValueError(mode)
