"""Sharded batch inference over a device mesh.

The reference serves single-GPU only (SURVEY.md §2i); the TPU-native scale-out path
for serving/eval is data-parallel jit over a ``("data",)`` mesh — params replicated,
batch split over ICI, with XLA compiling one SPMD program. For models whose head is
wide enough to matter, the classifier kernel can additionally be tensor-parallel over
a ``model`` axis (the same sharding the dryrun train step uses, __graft_entry__.py).
"""

from typing import Callable, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import batch_sharding, create_mesh

__all__ = ["shard_inference"]


def shard_inference(
    model,
    mesh: Optional[Mesh] = None,
    head_tensor_parallel: bool = False,
) -> Callable:
    """Returns a jitted ``x -> logits`` running data-parallel over the mesh.

    Args:
        model: an initialized :class:`~holocron_tpu.models.core.Model` (reparametrize
            / quantize first as desired — a ``QuantizedModel`` works too).
        mesh: defaults to a 1-axis ``("data",)`` mesh over all devices.
        head_tensor_parallel: additionally shard any ``head`` Dense kernel's output
            dim over the mesh's ``model`` axis (requires a 2-axis mesh).

    The returned callable accepts a host or device batch whose leading dim divides
    the data-axis size, shards it, and returns replicated logits.
    """
    if model.variables is None:
        raise RuntimeError("initialize the model first (run a forward or .init())")
    if mesh is None:
        mesh = create_mesh(axes=("data",))
    data = batch_sharding(mesh, "data")
    repl = NamedSharding(mesh, P())

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
    if qparams is not None:  # QuantizedModel: int8 kernels + scales replicate
        qparams = jax.tree.map(lambda leaf: jax.device_put(leaf, repl), qparams)
        inner = model.apply_fn()
        fwd = jax.jit(
            lambda v, q, x: inner(v, q, x), in_shardings=(None, None, data), out_shardings=repl
        )
        return lambda x: fwd(variables, qparams, x)

    module = model.module
    fwd = jax.jit(
        lambda v, x: module.apply(v, x, train=False), in_shardings=(None, data), out_shardings=repl
    )
    return lambda x: fwd(variables, x)
