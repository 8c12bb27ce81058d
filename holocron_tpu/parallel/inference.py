"""Sharded batch inference over a device mesh.

The reference serves single-GPU only (SURVEY.md §2i); the TPU-native scale-out path
for serving/eval is data-parallel jit over a ``("data",)`` mesh — params replicated,
batch split over ICI, with XLA compiling one SPMD program. For models whose head is
wide enough to matter, the classifier kernel can additionally be tensor-parallel over
a ``model`` axis (the same sharding the dryrun train step uses, __graft_entry__.py).

``tensor_parallel=True`` goes further and channel-shards the whole backbone
(Megatron-style column parallelism, applied uniformly): every wide-enough
per-output-channel dimension — conv HWIO kernels, BN/LN scale/bias/stats vectors,
dense kernels — is split over the ``model`` axis and the activations stay
channel-sharded between layers, so GSPMD propagates the sharding through the conv
chain and only inserts collectives where the parallelism genuinely breaks (grouped
convs whose group width falls below the shard, residual concats, the softmax head).
This is the scaling-book recipe (pick a mesh, annotate the weights, let XLA place
the collectives) and the latency path for models whose single-chip form is
MXU-serial — each chip computes 1/N of every layer's output channels.
"""

from typing import Callable, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import batch_sharding, create_mesh

__all__ = ["shard_inference", "tensor_parallel_specs"]


def tensor_parallel_specs(variables, mesh: Mesh, axis: str = "model", min_channels: int = 64):
    """Channel-sharding pytree for a model's variables (params + batch stats).

    The rule is uniform and graph-free: a leaf whose trailing dimension is the
    per-output-channel one (conv HWIO kernels, norm scale/bias and running stats,
    dense kernels, per-channel quantization scales) gets that dimension split over
    ``axis`` whenever it divides the axis size and is at least ``min_channels`` wide;
    everything else replicates. GSPMD then propagates these shardings through the
    forward graph — the TPU analog of hand-placed Megatron column parallelism,
    with XLA choosing where the all-gathers go.

    Returns a pytree of :class:`NamedSharding` matching ``variables``.
    """
    n_shards = mesh.shape[axis]
    repl = NamedSharding(mesh, P())

    def spec(leaf):
        ndim = getattr(leaf, "ndim", 0)  # optimizer states may carry scalar leaves
        if ndim >= 1 and leaf.shape[-1] >= min_channels and leaf.shape[-1] % n_shards == 0:
            return NamedSharding(mesh, P(*([None] * (ndim - 1)), axis))
        return repl

    return jax.tree.map(spec, variables)


def shard_inference(
    model,
    mesh: Optional[Mesh] = None,
    head_tensor_parallel: bool = False,
    tensor_parallel: bool = False,
    min_channels: int = 64,
) -> Callable:
    """Returns a jitted ``x -> logits`` running data-parallel over the mesh.

    Args:
        model: an initialized :class:`~holocron_tpu.models.core.Model` (reparametrize
            / quantize first as desired — a ``QuantizedModel`` works too).
        mesh: defaults to a 1-axis ``("data",)`` mesh over all devices.
        head_tensor_parallel: additionally shard any ``head`` Dense kernel's output
            dim over the mesh's ``model`` axis (requires a 2-axis mesh).
        tensor_parallel: channel-shard the whole backbone over the ``model`` axis
            (see :func:`tensor_parallel_specs`) — combine with a
            ``("data", "model")`` mesh for DP x TP inference.
        min_channels: narrowest channel dimension worth sharding under
            ``tensor_parallel`` (narrow layers replicate — splitting them would
            under-fill the MXU lanes on every shard).

    The returned callable accepts a host or device batch whose leading dim divides
    the data-axis size, shards it, and returns replicated logits.
    """
    if model.variables is None:
        raise RuntimeError("initialize the model first (run a forward or .init())")
    if mesh is None:
        mesh = create_mesh(axes=("data",))
    # the grouped-conv execution choice keys on the PER-DEVICE batch; scope the
    # declaration around our own calls (tracing happens inside the first one) so it
    # cannot leak into later unrelated single-device models
    from ..nn.modules.conv import data_shards

    n_data = mesh.shape["data"] if "data" in mesh.axis_names else 1
    data = batch_sharding(mesh, "data")
    repl = NamedSharding(mesh, P())
    if tensor_parallel and "model" not in mesh.axis_names:
        raise ValueError("tensor_parallel requires a mesh with a 'model' axis")

    if tensor_parallel:
        tp_specs = tensor_parallel_specs(model.variables, mesh, min_channels=min_channels)
        variables = jax.tree.map(jax.device_put, model.variables, tp_specs)
    else:

        def var_spec(path, leaf):
            if head_tensor_parallel and leaf.ndim == 2:
                keys = [getattr(p, "key", None) for p in path]
                if "head" in keys and keys[-1] == "kernel" and "model" in mesh.axis_names:
                    return NamedSharding(mesh, P(None, "model"))
            return repl

        variables = jax.tree_util.tree_map_with_path(
            lambda path, leaf: jax.device_put(leaf, var_spec(path, leaf)), model.variables
        )

    qparams = getattr(model, "qparams", None)
    if qparams is not None:  # QuantizedModel: int8 kernels + per-channel scales
        if tensor_parallel:
            q_specs = tensor_parallel_specs(qparams, mesh, min_channels=min_channels)
            qparams = jax.tree.map(jax.device_put, qparams, q_specs)
        else:
            qparams = jax.tree.map(lambda leaf: jax.device_put(leaf, repl), qparams)
        inner = model.apply_fn()
        fwd = jax.jit(
            lambda v, q, x: inner(v, q, x), in_shardings=(None, None, data), out_shardings=repl
        )

        def run_q(x):
            with data_shards(n_data):
                return fwd(variables, qparams, x)

        return run_q

    module = model.module
    fwd = jax.jit(
        lambda v, x: module.apply(v, x, train=False), in_shardings=(None, data), out_shardings=repl
    )

    def run(x):
        with data_shards(n_data):
            return fwd(variables, x)

    return run
