from facegantts_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    create_mesh,
    distributed_init,
    fsdp_sharding,
    fsdp_spec,
    replicated,
    shard_batch,
    shard_state,
)
