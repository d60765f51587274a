from dyffusion_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
    shard_train_state,
    value_sharding,
)
