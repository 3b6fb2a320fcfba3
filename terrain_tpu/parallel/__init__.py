"""Parallelism layer: device meshes, DP/TP shardings, distributed init."""

from terrain_tpu.parallel.distributed import (
    HostShardIterator,
    host_batch_slice,
    initialize,
)
from terrain_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    place,
    replicated,
    spatial_batch_sharding,
    tp_shardings,
)

__all__ = ["make_mesh", "batch_sharding", "spatial_batch_sharding",
           "replicated", "tp_shardings", "place",
           "initialize", "host_batch_slice", "HostShardIterator"]
