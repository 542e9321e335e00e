from laplace_jax.parallel.sharding import (
    DataParallel,
    data_mesh,
    multihost_mesh,
    shard_closure,
    shard_map_closure,
)

__all__ = [
    "DataParallel",
    "data_mesh",
    "multihost_mesh",
    "shard_closure",
    "shard_map_closure",
]
