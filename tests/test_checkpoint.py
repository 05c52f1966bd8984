"""Checkpoint save/load round trip (utils/checkpoint.py).

The resume guarantee this framework adds over the reference (SURVEY.md §5:
the reference re-samples points and restarts phase 1 on resume) is that
EVERY TrainState leaf — student + teacher params, optimizer state, step
counter and the per-image point caches — restores bit-exactly.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from point_teacher_tpu.core.proposals import FineProposalCfg
from point_teacher_tpu.models.detector import StudentFCOS
from point_teacher_tpu.train.config import PointTeacherConfig
from point_teacher_tpu.train.optim import make_optimizer
from point_teacher_tpu.train.state import create_train_state
from point_teacher_tpu.utils.checkpoint import (load_checkpoint, load_meta,
                                                save_checkpoint)


def test_checkpoint_round_trip(tmp_path):
    cfg = PointTeacherConfig(
        num_classes=4, img_size=64, max_gt=4, batch_size=2,
        fine_proposal_cfg=(FineProposalCfg(base_ratios=(1.0,)),),
        fine_proposal_extensive_cfg=(FineProposalCfg(base_ratios=(1.0, 1.2)),),
    )
    rng = jax.random.PRNGKey(0)
    model = StudentFCOS(num_classes=cfg.num_classes, dtype=jnp.float32)
    params = model.init(rng, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 7, 7, 256)),
                        method=StudentFCOS.init_all)
    tx = make_optimizer(params, cfg.optim)
    state = create_train_state(params, tx, num_images=8, max_gt=4, rng=rng)

    # dirty every stateful leaf so the round trip is non-vacuous
    r = np.random.RandomState(1)
    state = state.replace(
        step=jnp.asarray(1234, jnp.int32),
        refined_points=jnp.asarray(r.randn(8, 4, 2).astype(np.float32)),
        teacher_params=jax.tree_util.tree_map(
            lambda x: x + 0.25, state.teacher_params),
    )

    path = os.path.join(tmp_path, "ckpt.msgpack")
    save_checkpoint(state, path, meta={"epoch": 7, "best_map": 0.31})

    template = create_train_state(params, tx, num_images=8, max_gt=4, rng=rng)
    restored = load_checkpoint(template, path)

    flat_a, tree_a = jax.tree_util.tree_flatten(state)
    flat_b, tree_b = jax.tree_util.tree_flatten(restored)
    assert tree_a == tree_b
    assert len(flat_a) == len(flat_b) and len(flat_a) > 10
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    meta = load_meta(path)
    assert meta["epoch"] == 7 and meta["best_map"] == 0.31
