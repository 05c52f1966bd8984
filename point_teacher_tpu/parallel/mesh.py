"""Data parallelism over a `jax.sharding.Mesh` (the NCCL-DDP replacement).

Capability target: MMDistributedDataParallel + torch.distributed.launch
(mmdet/apis/train.py:73-85, tools/dist_train.sh) re-expressed TPU-native:
- one SPMD program via jit with NamedShardings: batch sharded on the 'data'
  axis, train state replicated;
- the gradient all-reduce, the global `num_pos` normalisers (the reference's
  `reduce_mean`) and the EMA update all fall out of XLA partitioning — no
  explicit collectives, no find_unused_parameters workaround (the teacher is
  functional state, not unused parameters);
- the per-image point caches are replicated and updated identically on every
  device (scatter of identical values — deterministic).

The CNN detector needs no TP/PP/SP (SURVEY.md §2.3: reference is DP-only);
the mesh is 1-D. Extending to multi-slice DCN meshes = adding an outer axis
to `make_mesh` and keeping batch sharding on the flattened axis.
"""
from __future__ import annotations

from typing import Optional, Sequence  # noqa: F401 (public API typing)

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train.state import Batch


def make_mesh(devices: Optional[Sequence] = None, axis: str = "data") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> Batch:
    s = NamedSharding(mesh, P(axis))
    return Batch(image=s, gt_boxes=s, gt_labels=s, gt_valid=s, image_ids=s)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Batch, mesh: Mesh, axis: str = "data") -> Batch:
    shardings = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(jax.device_put, batch, shardings)


def shard_stacked_batch(batch: Batch, mesh: Mesh, axis: str = "data") -> Batch:
    """Shard a [K, B, ...]-stacked superstep batch: axis 0 is the scan/step
    axis (replicated), axis 1 is the per-step batch axis (split on `axis`)."""
    s = NamedSharding(mesh, P(None, axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate_state(state, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)


def make_sharded_train_step(model, tx, cfg, mesh: Mesh, axis: str = "data",
                            donate: bool = False):
    """jit the train step with explicit input/output shardings over `mesh`."""
    from ..train.steps import build_train_step
    import jax.numpy as jnp

    inner = build_train_step(model, tx, cfg, donate=donate)

    def run(state, batch, phase1: bool):
        # jit partitions according to input shardings: replicated state,
        # batch split on the data axis -> DP with gradient psum inserted by XLA
        state = replicate_state(state, mesh)
        batch = shard_batch(batch, mesh, axis)
        return inner(state, batch, phase1)

    return run


def make_sharded_rotated_train_step(model, tx, cfg, mesh: Mesh,
                                    axis: str = "data", donate: bool = False):
    """Rotated analog of make_sharded_train_step (same replicated-state /
    batch-split SPMD DP recipe over the rotated TS step)."""
    from ..train.rsteps import build_rotated_train_step

    inner = build_rotated_train_step(model, tx, cfg, donate=donate)

    def run(state, batch, phase1: bool):
        state = replicate_state(state, mesh)
        batch = shard_batch(batch, mesh, axis)
        return inner(state, batch, phase1)

    return run
