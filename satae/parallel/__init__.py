from satae.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_grid_mesh,
    make_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)
