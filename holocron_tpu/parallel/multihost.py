"""Multi-host (multi-slice) scaling: process initialization and hybrid ICI×DCN meshes.

The reference has no distributed support at all (SURVEY.md §2i); single-host DP over
ICI is the parity requirement and lives in ``mesh.py``. This module is the forward
path beyond parity: train across hosts/slices where the slow links are data-center
network (DCN), not ICI. The recipe (per the scaling playbook):

- every process calls :func:`initialize` once before any jax call,
- build the mesh with :func:`hybrid_mesh` — DCN-parallel axes outermost, ICI-parallel
  axes innermost, so XLA's gradient reductions decompose into a cheap per-slice psum
  over ICI followed by a small cross-slice psum over DCN,
- everything else (shardings, the jitted train step) is unchanged: a Mesh is a Mesh.

On one host this degrades to the plain device mesh, so the same code runs everywhere
(and is exactly what the CPU-mesh tests exercise).
"""

import os
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["host_local_put", "hybrid_mesh", "initialize", "num_slices", "replicate_to_host"]

_INITIALIZED = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Joins the multi-process jax runtime (idempotent; no-op for single process).

    Arguments default to the standard env vars (``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``); on Cloud TPU pods all three are
    auto-detected by jax and may be omitted entirely.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    # IMPORTANT: decide from the ENV only — probing jax.process_count() here would
    # initialize the backend before jax.distributed.initialize, which both reads 1
    # (distributed context not joined yet) and breaks the subsequent join
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "0")) or None
    process_id = process_id if process_id is not None else (
        int(os.environ["JAX_PROCESS_ID"]) if "JAX_PROCESS_ID" in os.environ else None
    )
    if coordinator_address is None and num_processes is None:
        _INITIALIZED = True
        return  # single-process run (or Cloud TPU pod auto-detection): nothing to join
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as exc:  # the user already joined the runtime themselves
        if "once" not in str(exc):
            raise
    _INITIALIZED = True


def host_local_put(data, sharding):
    """Places a per-process batch shard onto a (possibly multi-host) mesh.

    Single-process: plain ``jax.device_put``. Multi-process: each host passes ONLY
    its own loader shard (``DataLoader(num_shards="auto")``) and the global array
    is assembled with ``jax.make_array_from_process_local_data`` — the per-host
    rows land on that host's addressable devices and the array's global shape is
    ``process_count`` times the local batch along the sharded dim. A bare
    ``device_put`` with a global sharding would instead interpret every host's
    local batch as the same global array and silently consume only the host's
    addressable slice of it (half the data at 2 hosts), which is why the trainer
    routes all batch placement through here.
    """
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, np.asarray(data))
    return jax.device_put(data, sharding)


def replicate_to_host(leaf, mesh) -> np.ndarray:
    """Returns ``leaf`` as a host numpy array, replicate-gathering sharded
    (non-addressable, non-replicated) leaves through a jitted identity first.

    The gather is a COLLECTIVE: under multi-process, every process must call this
    in lockstep for the same leaves (then typically only process 0 writes the
    result). Fully-replicated and addressable leaves are read directly. Used by
    ``Trainer.save``'s msgpack branch and the multi-process certification worker.
    """
    if (
        isinstance(leaf, jax.Array)
        and not leaf.is_fully_addressable
        and not leaf.is_fully_replicated
    ):
        from jax.sharding import NamedSharding, PartitionSpec

        leaf = jax.jit(lambda t: t, out_shardings=NamedSharding(mesh, PartitionSpec()))(leaf)
    return np.asarray(leaf)


def num_slices() -> int:
    """Number of ICI-connected islands among the visible devices (1 on a single
    slice/host; CPU devices report no slice_index and count as one)."""
    ids = {getattr(d, "slice_index", 0) or 0 for d in jax.devices()}
    return max(len(ids), 1)


def hybrid_mesh(
    axes: Tuple[str, ...] = ("data", "model"),
    model_parallel: int = 1,
    dcn_data_parallel: Optional[int] = None,
) -> Mesh:
    """Builds a mesh whose ``data`` axis spans DCN×ICI and whose ``model`` axis stays
    inside a slice (model-parallel collectives must ride ICI, never DCN).

    Args:
        axes: mesh axis names, data-parallel first
        model_parallel: size of the trailing ``model`` axis (must divide the
            per-slice device count — tensor parallelism never crosses DCN)
        dcn_data_parallel: number of slices (defaults to the detected count)
    """
    devices = jax.devices()
    n = len(devices)
    slices = dcn_data_parallel or num_slices()
    if n % slices != 0:
        raise ValueError(f"{n} devices cannot split into {slices} equal slices")
    per_slice = n // slices
    if per_slice % model_parallel != 0:
        raise ValueError(
            f"model-parallel factor {model_parallel} must divide the per-slice device count {per_slice}"
        )
    if slices > 1:
        from jax.experimental import mesh_utils

        mesh_devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(per_slice // model_parallel, model_parallel),
            dcn_mesh_shape=(slices, 1),
            devices=devices,
        )
    else:
        # single slice: sort for determinism, slowest-varying axis first
        arr = np.asarray(sorted(devices, key=lambda d: d.id))
        mesh_devices = arr.reshape(n // model_parallel, model_parallel)
    if len(axes) == 1:
        mesh_devices = np.asarray(mesh_devices).reshape(-1)
    return Mesh(mesh_devices, axes[: np.asarray(mesh_devices).ndim])
