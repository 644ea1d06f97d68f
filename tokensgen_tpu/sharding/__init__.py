from tokensgen_tpu.sharding.mesh import (  # noqa: F401
    MeshSpec,
    make_mesh,
    shard_batch,
    replicate,
)
