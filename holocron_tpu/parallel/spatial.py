"""Spatial partitioning (SP): shard the image height over the mesh.

The reference has no distributed support at all (SURVEY.md §2i — its trainer binds
one GPU, `/root/reference/holocron/trainer/core.py`), so high-resolution dense
prediction is capped by one device's memory. The TPU-native scale-out for that
regime is *spatial partitioning*: the NHWC activations are sharded along H, the
parameters replicate, and XLA's SPMD partitioner inserts the halo exchanges — a
``collective-permute`` of the kernel-overlap rows between H-neighbours — that every
windowed op (conv, pooling, blur-pool) needs at its shard boundaries. Each chip
then holds and computes only ``H / n_shards`` rows of every activation, which is
what lets a 2048px+ U-Net forward that cannot fit a single chip's HBM run at all,
and is the batch-1 latency path for dense prediction (a single image cannot be
data-parallel).

This follows the scaling-book recipe end to end: pick a mesh, annotate the input
(and only the input — one ``with_sharding_constraint``), and let GSPMD propagate
the H-sharding through the conv chain, placing halos where windows cross shards
and reductions (global pool, losses) where the parallelism genuinely ends. It
composes with data parallelism on a ``("data", "spatial")`` mesh: batch over
``data``, rows over ``spatial``.
"""

from typing import Callable, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import create_mesh

__all__ = ["shard_spatial_inference", "spatial_sharding"]


def spatial_sharding(
    mesh: Mesh, axis: str = "spatial", batch_axis: Optional[str] = None
) -> NamedSharding:
    """Sharding for an NHWC batch: H split over ``axis`` (and optionally the batch
    over ``batch_axis`` for a DP x SP mesh)."""
    return NamedSharding(mesh, P(batch_axis, axis))


def shard_spatial_inference(
    model,
    mesh: Optional[Mesh] = None,
    axis: str = "spatial",
    batch_axis: Optional[str] = None,
    gather_output: bool = True,
) -> Callable:
    """Returns a jitted ``x -> y`` running the model spatially partitioned over H.

    Args:
        model: an initialized :class:`~holocron_tpu.models.core.Model`
            (reparametrize first as desired).
        mesh: defaults to a 1-axis ``(axis,)`` mesh over all devices.
        axis: mesh axis the image height is sharded over.
        batch_axis: optionally also shard the batch (DP x SP) — requires a 2-axis
            mesh containing both names.
        gather_output: replicate the output on return (the right default for
            classification logits and modest segmentation maps). Pass ``False``
            to leave the output sharding to GSPMD — for huge dense-prediction
            maps this keeps the result H-sharded across the mesh instead of
            materializing it on every device.

    The input H does not need to divide the axis size: when it does, the input is
    pinned to the H-sharding at the jit boundary (the transfer itself lands each
    row group on its device); when it does not, the pin is dropped and the single
    ``with_sharding_constraint`` inside the traced function takes over — GSPMD
    pads the ragged shard internally. Params replicate: SP's memory win is in the
    activations, which dominate at high resolution.
    """
    if model.variables is None:
        raise RuntimeError("initialize the model first (run a forward or .init())")
    if mesh is None:
        mesh = create_mesh(axes=(axis,))
    if axis not in mesh.axis_names:
        raise ValueError(f"mesh has no '{axis}' axis (axes: {mesh.axis_names})")
    if batch_axis is not None and batch_axis not in mesh.axis_names:
        raise ValueError(f"mesh has no '{batch_axis}' axis (axes: {mesh.axis_names})")

    x_sharding = spatial_sharding(mesh, axis, batch_axis)
    repl = NamedSharding(mesh, P())
    module = model.module
    variables = jax.device_put(model.variables, repl)

    def fwd(v, x):
        # the single annotation SP needs: H sharded at the input; GSPMD propagates
        # it through every conv/pool and places the halo exchanges at the seams
        x = jax.lax.with_sharding_constraint(x, x_sharding)
        return module.apply(v, x, train=False)

    out_shardings = repl if gather_output else None
    # H divisible by the axis: pin the input sharding at the jit boundary so the
    # host transfer itself is the shard placement. Ragged H: an explicit input
    # sharding would be rejected (device_put needs divisibility), so fall back to
    # the unpinned jit and let the traced with_sharding_constraint pad internally.
    jfwd = jax.jit(fwd, in_shardings=(None, x_sharding), out_shardings=out_shardings)
    jfwd_ragged = jax.jit(fwd, out_shardings=out_shardings)
    n_sp = mesh.shape[axis]

    def call(x):
        divisible = x.shape[1] % n_sp == 0 and (
            batch_axis is None or x.shape[0] % mesh.shape[batch_axis] == 0
        )
        return (jfwd if divisible else jfwd_ragged)(variables, x)

    return call
