"""Device meshes and sharding rules."""

from pkr_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_params,
    param_sharding_rules,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_params",
    "param_sharding_rules",
]
