"""Mesh/sharding utilities (data-parallel SPMD over ICI + DCN multi-host)."""

from .dist import (gather_predictions, init_distributed, is_main_process,
                   process_count)
from .mesh import (batch_sharding, make_mesh, pad_to_multiple, replicate,
                   replicated, shard_batch)

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch",
           "replicate", "pad_to_multiple", "init_distributed",
           "is_main_process", "process_count", "gather_predictions"]
