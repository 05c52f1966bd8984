#!/usr/bin/env bash
# Capability target: HBB_TOD/tools/dist_train.sh (torch.distributed.launch).
# TPU-native training is single-program SPMD: one process drives every local
# chip through jit + jax.sharding (point_teacher_tpu.parallel). No launcher,
# no process group, no NPROC — just run train.py; it data-parallels over
# jax.devices() when more than one chip is visible.
CONFIG=$1
shift
exec python "$(dirname "$0")/train.py" "$CONFIG" "$@"
