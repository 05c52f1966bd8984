"""Optimizer semantics: paramwise masks, schedule, grad clip
(mirrors the reference's SGD + paramwise_cfg + warmup/step policy)."""
import jax
import jax.numpy as jnp
import numpy as np

from point_teacher_tpu.train.config import OptimCfg
from point_teacher_tpu.train.optim import make_lr_schedule, make_optimizer, param_label


def test_param_labels():
    # frozen: any bn subtree, stem, layer1 (frozen_stages=1)
    mk = lambda *names: tuple(type("K", (), {"key": n})() for n in names)  # noqa: E731
    assert param_label(mk("backbone", "stem_conv", "kernel"), 1) == "frozen"
    assert param_label(mk("backbone", "layer1_block0", "conv1", "kernel"), 1) == "frozen"
    assert param_label(mk("backbone", "layer2_block0", "bn1", "scale"), 1) == "frozen"
    assert param_label(mk("backbone", "layer2_block0", "conv1", "kernel"), 1) == "base"
    assert param_label(mk("bbox_head", "conv_cls", "bias"), 1) == "bias"
    assert param_label(mk("bbox_head", "conv_cls", "kernel"), 1) == "base"
    # OBB: trainable BN affine outside frozen stages
    assert param_label(mk("backbone", "layer2_block0", "bn1", "scale"), 1, True) == "base"
    assert param_label(mk("backbone", "layer2_block0", "bn1", "mean"), 1, True) == "frozen"
    assert param_label(mk("backbone", "layer1_block0", "bn1", "scale"), 1, True) == "frozen"


def test_lr_schedule_warmup_and_steps():
    cfg = OptimCfg(base_lr=0.01, warmup_iters=100, warmup_ratio=1 / 3,
                   step_epochs=(8, 11), iters_per_epoch=1000)
    sched = make_lr_schedule(cfg)
    assert np.isclose(float(sched(0)), 0.01 / 3)
    assert np.isclose(float(sched(99)), 0.01 / 3)
    assert np.isclose(float(sched(100)), 0.01)  # warmup done, before epoch 8
    # step decay at epoch 8 (iter 80) -> but warmup still active until 100
    cfg2 = OptimCfg(base_lr=0.01, warmup_iters=0, step_epochs=(8, 11), iters_per_epoch=10)
    s2 = make_lr_schedule(cfg2)
    assert np.isclose(float(s2(79)), 0.01)
    assert np.isclose(float(s2(80)), 0.001)
    assert np.isclose(float(s2(110)), 0.0001)


def test_optimizer_updates_and_freezing():
    params = {
        "backbone": {
            "stem_conv": {"kernel": jnp.ones((3, 3))},
            "layer2_block0": {"bn1": {"scale": jnp.ones(4), "mean": jnp.zeros(4)},
                              "conv1": {"kernel": jnp.ones((2, 2))}},
        },
        "head": {"conv": {"kernel": jnp.ones((2, 2)), "bias": jnp.zeros(2)}},
    }
    cfg = OptimCfg(base_lr=0.1, warmup_iters=0, weight_decay=0.0, momentum=0.0,
                   iters_per_epoch=10 ** 6)
    tx = make_optimizer(params, cfg)
    st = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, st, params)
    # frozen subtrees get exact zero updates
    assert float(jnp.abs(updates["backbone"]["stem_conv"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(updates["backbone"]["layer2_block0"]["bn1"]["scale"]).max()) == 0.0
    # base param moves by ~lr (grads clipped by global norm first)
    base_u = updates["backbone"]["layer2_block0"]["conv1"]["kernel"]
    bias_u = updates["head"]["conv"]["bias"]
    assert float(jnp.abs(base_u).max()) > 0
    # bias lr x2
    assert np.isclose(float(bias_u[0] / base_u[0, 0]), 2.0, rtol=1e-5)


def test_grad_clip():
    params = {"w": jnp.ones(4)}
    cfg = OptimCfg(base_lr=1.0, warmup_iters=0, weight_decay=0.0, momentum=0.0,
                   grad_clip_norm=1.0, iters_per_epoch=10 ** 6)
    tx = make_optimizer(params, cfg)
    st = tx.init(params)
    big = {"w": jnp.full(4, 100.0)}
    updates, _ = tx.update(big, st, params)
    assert np.isclose(float(jnp.linalg.norm(updates["w"])), 1.0, rtol=1e-4)
