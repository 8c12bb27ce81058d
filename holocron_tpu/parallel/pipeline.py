"""Pipeline parallelism (PP): a GPipe schedule over a stack of identical blocks.

The reference has no distributed support (SURVEY.md §2i). On TPU, pipeline
parallelism complements tensor/spatial sharding for networks whose depth — not
width — is the scaling dimension: a run of S shape-preserving blocks (deep residual
stages, transformer layers) is split into ``n`` contiguous groups, one per device
along a ``pipe`` mesh axis, and microbatches stream through the groups with the
activations hopping device-to-device over ICI via ``lax.ppermute``. Only adjacent
devices ever communicate, and each transfer is one microbatch's activations — the
cheapest collective pattern ICI offers.

Scope is deliberately honest: GPipe needs every inter-stage activation to have ONE
static shape (the circulating buffer), so this applies to shape-preserving block
stacks — which is also the only regime where PP beats TP for conv nets, whose
stage boundaries change spatial/channel shapes. For whole conv models, prefer
channel TP (:func:`~holocron_tpu.parallel.tensor_parallel_specs`) or spatial
partitioning (:mod:`~holocron_tpu.parallel.spatial`); reach for the pipeline when
one device cannot hold a deep stack's weights+activations, e.g. the 8-block
512-channel runs of sknet152/darknet53-scale models or any transformer-style stack
built on top of this package.

The schedule is the classic GPipe diagonal: ``M`` microbatches over ``n`` stages
take ``M + n - 1`` ticks, with a bubble fraction of ``(n-1)/(M+n-1)`` — raise
``num_microbatches`` to amortize it. Everything is ``lax.scan``/``ppermute``
inside one ``shard_map``: a single compiled SPMD program, no host round-trips
between ticks.
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import create_mesh

__all__ = ["pipeline_blocks"]


def pipeline_blocks(
    block_fn: Callable,
    stacked_params,
    x: jax.Array,
    mesh: Optional[Mesh] = None,
    axis: str = "pipe",
    num_microbatches: Optional[int] = None,
):
    """Applies ``S`` stacked blocks sequentially, pipelined over the mesh.

    Args:
        block_fn: ``(params_i, x) -> y`` for ONE block, with ``y.shape == x.shape``
            (shape-preserving — the GPipe buffer contract).
        stacked_params: pytree whose leaves have a leading dim ``S`` (one slice per
            block, as produced by ``jax.vmap``-style init or ``jnp.stack``). ``S``
            must be divisible by the pipe-axis size; each device runs ``S/n``
            consecutive blocks via an inner ``lax.scan``.
        x: the full batch ``(B, ...)``; split into ``num_microbatches`` equal
            microbatches along dim 0 (``B`` must divide).
        mesh: defaults to a 1-axis ``(axis,)`` mesh over all devices.
        axis: mesh axis the stages are laid out along.
        num_microbatches: defaults to the stage count (bubble fraction ~50%;
            raise it to amortize).

    Returns ``y`` with ``y.shape == x.shape``, replicated — numerically identical
    to folding ``block_fn`` over all ``S`` blocks on one device (tested).
    """
    if mesh is None:
        mesh = create_mesh(axes=(axis,))
    if axis not in mesh.axis_names:
        raise ValueError(f"mesh has no '{axis}' axis (axes: {mesh.axis_names})")
    n = mesh.shape[axis]
    s = jax.tree.leaves(stacked_params)[0].shape[0]
    if s % n != 0:
        raise ValueError(f"{s} blocks cannot split into {n} pipeline stages")
    m = num_microbatches if num_microbatches is not None else n
    if x.shape[0] % m != 0:
        raise ValueError(f"batch {x.shape[0]} does not divide into {m} microbatches")

    def stage(params_local, x):
        # params_local: this stage's (S/n, ...) slice of every param leaf
        idx = lax.axis_index(axis)
        mbs = x.reshape(m, x.shape[0] // m, *x.shape[1:])

        def run_blocks(x_mb):
            def body(carry, p):
                return block_fn(p, carry), None

            y, _ = lax.scan(body, x_mb, params_local)
            return y

        def tick(carry, t):
            state, outputs = carry
            # stage 0 feeds microbatch t (clipped: past M it re-reads a stale one,
            # whose result is never written); later stages consume the hop buffer
            mb_t = lax.dynamic_index_in_dim(mbs, jnp.clip(t, 0, m - 1), 0, keepdims=False)
            out = run_blocks(jnp.where(idx == 0, mb_t, state))
            # the last stage finishes microbatch j = t - (n-1) at tick t
            j = t - (n - 1)
            upd = lax.dynamic_update_index_in_dim(outputs, out, jnp.clip(j, 0, m - 1), 0)
            outputs = jnp.where((idx == n - 1) & (j >= 0), upd, outputs)
            # hop every stage's output to its right neighbour over ICI
            state = lax.ppermute(out, axis, [(i, (i + 1) % n) for i in range(n)])
            return (state, outputs), None

        (_, outputs), _ = lax.scan(
            tick, (jnp.zeros_like(mbs[0]), jnp.zeros_like(mbs)), jnp.arange(m + n - 1)
        )
        # outputs are only valid on the last stage: mask + psum replicates them
        mask = (idx == n - 1).astype(outputs.dtype)
        return lax.psum(outputs * mask, axis).reshape(x.shape)

    from jax.experimental.shard_map import shard_map

    fn = shard_map(
        stage,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(),
        check_rep=False,  # replication is established by the psum above
    )
    return fn(stacked_params, x)
