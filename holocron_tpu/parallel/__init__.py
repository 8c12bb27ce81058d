from . import collectives
from .inference import shard_inference, tensor_parallel_specs
from .mesh import batch_sharding, create_mesh, replicated, shard_batch
from .multihost import hybrid_mesh, initialize, num_slices

__all__ = [
    "batch_sharding",
    "create_mesh",
    "hybrid_mesh",
    "initialize",
    "num_slices",
    "replicated",
    "shard_batch",
    "shard_inference",
    "tensor_parallel_specs",
]
