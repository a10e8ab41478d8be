from facegantts_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    distributed_init,
    shard_batch,
    shard_state,
)
