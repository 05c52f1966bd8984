"""Mesh/data-parallel utilities (the mock-distributed test analog)."""
import jax
import jax.numpy as jnp
import numpy as np

from point_teacher_tpu.parallel.mesh import (
    batch_sharding, make_mesh, replicate_state, shard_batch,
)
from point_teacher_tpu.train.state import Batch


def _batch(b):
    return Batch(
        image=np.zeros((b, 8, 8, 3), np.float32),
        gt_boxes=np.zeros((b, 2, 4), np.float32),
        gt_labels=np.zeros((b, 2), np.int32),
        gt_valid=np.ones((b, 2), bool),
        image_ids=np.arange(b, dtype=np.int32),
    )


def test_shard_batch_over_mesh():
    assert jax.device_count() == 8
    mesh = make_mesh()
    b = shard_batch(_batch(8), mesh)
    assert len(b.image.sharding.device_set) == 8
    # per-device shard carries one image
    assert b.image.addressable_shards[0].data.shape[0] == 1


def test_replicate_state():
    mesh = make_mesh()
    state = {"w": jnp.ones((4, 4))}
    rep = replicate_state(state, mesh)
    assert len(rep["w"].sharding.device_set) == 8
    assert rep["w"].addressable_shards[0].data.shape == (4, 4)  # full copy


def test_global_sum_matches_local():
    mesh = make_mesh()
    x = np.arange(16, dtype=np.float32).reshape(8, 2)
    b = _batch(8)._replace(image=np.broadcast_to(x[:, :, None, None], (8, 2, 1, 1)).copy())
    sharded = shard_batch(b, mesh)
    total = jax.jit(lambda im: im.sum())(sharded.image)
    assert float(total) == float(x.sum() * 1)
