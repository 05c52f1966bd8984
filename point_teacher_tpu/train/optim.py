"""Optimizer: SGD + momentum with mmdet-style paramwise rules as optax masks.

Capability target: mmdet/apis/train.py:88-109 build_optimizer with the config's
paramwise_cfg (bias_lr_mult=2, bias_decay_mult=0 — aitodv2_point_teacher_0%.py
:212-215), grad clip L2 max 35, constant warmup (ratio 1/3, 10k iters) and
step decay at epochs [8, 11].

Freezing (frozen_stages=1 + all FrozenBN buffers/affine) is an optimizer mask
(set_to_zero) so the model stays a pure function.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

from .config import OptimCfg

BN_PARAM_NAMES = ("scale", "bias", "mean", "var")


def _path_names(path) -> list:
    return [getattr(k, "key", getattr(k, "name", str(k))) for k in path]


def param_label(path, frozen_stages: int, bn_affine_trainable: bool = False) -> str:
    names = _path_names(path)
    # FrozenBN subtrees: module names contain 'bn'. Running stats (mean/var)
    # are always frozen; the affine (scale/bias) trains when the config asks
    # (the SODA-A backbone uses norm_cfg requires_grad=True,
    # sodaa_fcos_pointteacher_1x.py:34 — HBB freezes it, :34 of the 0% config).
    if any("bn" in str(n) for n in names[:-1]):
        leaf = str(names[-1])
        in_frozen_stage = any(
            str(n).startswith("stem") or any(
                str(n).startswith(f"layer{s}_") for s in range(1, frozen_stages + 1)
            )
            for n in names
        )
        if bn_affine_trainable and leaf in ("scale", "bias") and not in_frozen_stage:
            return "base"
        return "frozen"
    for s in range(frozen_stages + 1):
        tag = "stem" if s == 0 else f"layer{s}_"
        if any(str(n).startswith(tag) for n in names):
            return "frozen"
    if names and str(names[-1]) == "bias":
        return "bias"
    return "base"


def make_lr_schedule(cfg: OptimCfg, lr_mult: float = 1.0):
    base = cfg.base_lr * lr_mult

    def schedule(step):
        warm = jnp.where(step < cfg.warmup_iters, cfg.warmup_ratio, 1.0)
        epoch = step // cfg.iters_per_epoch
        decay = jnp.ones((), jnp.float32)
        for e in cfg.step_epochs:
            decay = decay * jnp.where(epoch >= e, 0.1, 1.0)
        return base * warm * decay

    return schedule


def make_optimizer(params, cfg: OptimCfg) -> optax.GradientTransformation:
    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: param_label(path, cfg.frozen_stages, cfg.bn_affine_trainable),
        params,
    )

    def sgd(lr_mult: float, wd: float):
        return optax.chain(
            optax.add_decayed_weights(wd),
            optax.trace(decay=cfg.momentum, nesterov=False),
            optax.scale_by_learning_rate(make_lr_schedule(cfg, lr_mult)),
        )

    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.multi_transform(
            {
                "base": sgd(1.0, cfg.weight_decay),
                "bias": sgd(cfg.bias_lr_mult, 0.0),
                "frozen": optax.set_to_zero(),
            },
            labels,
        ),
    )
