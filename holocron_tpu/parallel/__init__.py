from . import collectives
from .inference import shard_inference, tensor_parallel_specs
from .mesh import batch_sharding, create_mesh, replicated, shard_batch
from .multihost import host_local_put, hybrid_mesh, initialize, num_slices, replicate_to_host
from .pipeline import pipeline_blocks, pipeline_module, stack_stage_variables
from .spatial import shard_spatial_inference, spatial_sharding

__all__ = [
    "batch_sharding",
    "create_mesh",
    "host_local_put",
    "replicate_to_host",
    "hybrid_mesh",
    "initialize",
    "num_slices",
    "pipeline_blocks",
    "pipeline_module",
    "replicated",
    "shard_batch",
    "shard_inference",
    "stack_stage_variables",
    "shard_spatial_inference",
    "spatial_sharding",
    "tensor_parallel_specs",
]
