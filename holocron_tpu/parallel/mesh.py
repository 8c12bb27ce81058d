"""Device-mesh helpers: the scaling substrate for data-parallel training over ICI.

The reference has no distributed support (SURVEY.md §2i) — its trainer binds one GPU.
The TPU-native replacement: a named ``jax.sharding.Mesh`` with ``("data", "model")``
axes, batch sharded over ``data``, with the ``model`` axis reserved so tensor-parallel
shardings can be added without API breaks. XLA inserts the gradient reductions
(psum over ICI) when a jitted train step consumes sharded batches and replicated params.
"""

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["create_mesh", "batch_sharding", "replicated", "shard_batch"]


def create_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    axes: Tuple[str, ...] = ("data", "model"),
    model_parallel: int = 1,
) -> Mesh:
    """Builds a mesh over the given devices.

    Args:
        devices: defaults to all available devices
        axes: mesh axis names; data parallelism uses the first
        model_parallel: size of the trailing ``model`` axis
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices cannot host a model-parallel factor of {model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    if len(axes) == 1:
        arr = arr.reshape(n)
    return Mesh(arr, axes[: arr.ndim])


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding that splits the leading (batch) dimension over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Places a host batch (pytree of arrays) sharded over the data axis."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
