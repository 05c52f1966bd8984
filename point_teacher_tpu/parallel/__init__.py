from .mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    shard_stacked_batch,
    replicate_state,
    make_sharded_train_step,
)
