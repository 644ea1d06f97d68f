from tokensgen_tpu.sharding.mesh import (  # noqa: F401
    MeshSpec,
    initialize_multihost,
    make_mesh,
    process_batch_shard,
    replicate,
    shard_batch,
)
