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

Memory is genuinely distributed, which is the point of PP: the input and output
microbatches live on two *conveyor belts* — ring buffers sharded over the pipe
axis (``M/n`` microbatches per device) that shift one slot towards device 0 each
tick, so stage 0 always finds microbatch ``t`` at its belt head on tick ``t``, and
stage ``n-1`` drops each finished microbatch on the belt tail, where it rides the
remaining ticks to settle at exactly its final slot. Per-device activation
residency is ``2·B/n`` (the two belt shards) plus one circulating microbatch
``B/M`` — not the full batch — and per tick each device moves exactly three
microbatches over ICI (belt shift ×2 + stage hop). Warmup ticks put pipeline
bubbles on the output belt, but each wraps around into the belt tail on precisely
the tick stage ``n-1`` overwrites it with the real microbatch destined for its
slot, so no masking is needed.
"""

from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import create_mesh

__all__ = ["pipeline_blocks", "pipeline_module", "stack_stage_variables"]


def pipeline_blocks(
    block_fn: Callable,
    stacked_params,
    x: jax.Array,
    mesh: Optional[Mesh] = None,
    axis: str = "pipe",
    num_microbatches: Optional[int] = None,
    gather_output: bool = False,
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
            raise it to amortize). Must be a multiple of the pipe-axis size — the
            belts shard the microbatches evenly over the devices.
        gather_output: replicate the result on return. Default ``False`` keeps it
            sharded over the pipe axis on the batch dim (``M/n`` microbatches per
            device) — the memory-honest form; pass ``True`` only when every device
            needs the full output.

    Returns ``y`` with ``y.shape == x.shape`` — numerically identical to folding
    ``block_fn`` over all ``S`` blocks on one device (tested).
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
    if m % n != 0:
        raise ValueError(f"{m} microbatches cannot spread over {n} belt shards")
    if x.shape[0] % m != 0:
        raise ValueError(f"batch {x.shape[0]} does not divide into {m} microbatches")

    # one slot towards device 0 (belt shift) / one stage onwards (activation hop)
    left = [(i, (i - 1) % n) for i in range(n)]
    right = [(i, (i + 1) % n) for i in range(n)]

    def stage(params_local, in_belt):
        # params_local: this stage's (S/n, ...) slice of every param leaf
        # in_belt: this device's (m/n, B/m, ...) belt shard of the microbatches
        idx = lax.axis_index(axis)

        def run_blocks(x_mb):
            def body(carry, p):
                return block_fn(p, carry), None

            y, _ = lax.scan(body, x_mb, params_local)
            return y

        def shift_left(belt):
            # global ring shift by one slot: every device sends its belt head to
            # the left neighbour's tail (one microbatch over ICI per device)
            recv = lax.ppermute(belt[0], axis, left)
            return jnp.roll(belt, -1, axis=0).at[-1].set(recv)

        def tick(carry, _):
            in_belt, out_belt, state = carry
            # stage 0 consumes the belt head — after t shifts it holds microbatch
            # t; for t >= m it holds a wrapped, already-consumed slot whose output
            # never survives (see below). Later stages consume the previous
            # stage's hopped activation.
            out = run_blocks(jnp.where(idx == 0, in_belt[0], state))
            state = lax.ppermute(out, axis, right)
            in_belt = shift_left(in_belt)
            out_belt = shift_left(out_belt)
            # stage n-1 drops its finished microbatch (j = t - (n-1) at tick t) on
            # the belt tail: it travels exactly m-1-j remaining shifts and settles
            # at final slot j. Warmup outputs (t < n-1, pipeline still filling)
            # wrap around the ring into the tail on precisely the tick the real
            # microbatch destined for that slot overwrites them.
            out_belt = jnp.where(idx == n - 1, out_belt.at[-1].set(out), out_belt)
            return (in_belt, out_belt, state), None

        mb_zero = jnp.zeros_like(in_belt[0])
        (_, out_belt, _), _ = lax.scan(
            tick, (in_belt, jnp.zeros_like(in_belt), mb_zero), None, length=m + n - 1
        )
        return out_belt

    fn = jax.shard_map(
        stage,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    mbs = x.reshape(m, x.shape[0] // m, *x.shape[1:])
    y = fn(stacked_params, mbs).reshape(x.shape)
    if gather_output:
        y = jax.device_put(y, NamedSharding(mesh, P()))
    return y


def _find_stage_parent(tree: Mapping, prefix: str) -> Tuple[str, ...]:
    """Unique path of the mapping that owns the ``{prefix}0, {prefix}1, …`` run."""
    hits = []

    def walk(node, path):
        if isinstance(node, Mapping):
            if f"{prefix}0" in node:
                hits.append(path)
            for k, v in node.items():
                walk(v, (*path, k))

    walk(tree, ())
    if not hits:
        raise ValueError(f"no child named '{prefix}0' anywhere in the variable tree")
    if len(hits) > 1:
        raise ValueError(f"'{prefix}' is ambiguous — found under {hits}")
    return hits[0]


def stack_stage_variables(variables: Mapping, prefix: str) -> Dict[str, Any]:
    """Stacks the variables of a run of identically-shaped sibling blocks.

    Finds the unique parent module owning children ``{prefix}0, {prefix}1, …``
    (e.g. darknet53's ``features/layer_3_block_{0..7}`` — the 8-block 512-channel
    stage), checks every block's subtree matches the first one's structure/shapes,
    and stacks each leaf along a new leading ``S`` dim — exactly the
    ``stacked_params`` form :func:`pipeline_blocks` consumes. All variable
    collections that contain the parent path are stacked (``params`` AND
    ``batch_stats``), so the result feeds ``module.apply`` directly.

    This is the bridge from a zoo ``Model`` to the pipeline: the reference has no
    PP at all (SURVEY.md §2i); here any model whose depth lives in a stack of
    shape-preserving blocks gets GPipe without rewriting the model.
    """
    parent_path = _find_stage_parent(variables.get("params", variables), prefix)
    stacked: Dict[str, Any] = {}
    for coll, tree in variables.items():
        node = tree
        for k in parent_path:
            if not isinstance(node, Mapping) or k not in node:
                node = None
                break
            node = node[k]
        if node is None or f"{prefix}0" not in node:
            continue
        blocks = []
        while f"{prefix}{len(blocks)}" in node:
            blocks.append(node[f"{prefix}{len(blocks)}"])
        first = jax.tree.structure(blocks[0])
        for i, b in enumerate(blocks[1:], 1):
            if jax.tree.structure(b) != first:
                raise ValueError(f"block {prefix}{i} does not match {prefix}0's structure")
        stacked[coll] = jax.tree.map(lambda *leaves: jnp.stack(leaves), *blocks)
    if "params" not in stacked:
        raise ValueError(f"no '{prefix}*' params found")
    s = jax.tree.leaves(stacked["params"])[0].shape[0]
    if s < 2:
        raise ValueError(f"'{prefix}' names a single block — nothing to pipeline")
    return stacked


def pipeline_module(
    block,
    stacked_variables: Mapping,
    x: jax.Array,
    mesh: Optional[Mesh] = None,
    axis: str = "pipe",
    num_microbatches: Optional[int] = None,
    gather_output: bool = False,
):
    """GPipe over a stack of one linen block's variables (from
    :func:`stack_stage_variables` / :meth:`Model.stage_variables`).

    ``block`` is a module instance matching ONE block of the stack (e.g.
    ``ResBlock(512, 256)`` for darknet53's stage 3) and is applied in eval form
    (``train=False`` — BN consumes the stacked running stats; GPipe's microbatched
    schedule cannot produce full-batch BN statistics, so train-mode stat mutation
    is out of scope by design). Gradients w.r.t. the stacked variables flow
    through the schedule (tested).

    Example — pipeline darknet53's 8-block 512-channel stage over 4 devices::

        model = darknet53(); model.init((8, 64, 64, 3))
        stacked = model.stage_variables("layer_3_block_")
        y = pipeline_module(ResBlock(512, 256), stacked, stage_in,
                            mesh=create_mesh(axes=("pipe",)), num_microbatches=8)
    """

    def block_fn(vars_i, h):
        return block.apply(vars_i, h, train=False)

    return pipeline_blocks(
        block_fn, dict(stacked_variables), x, mesh, axis, num_microbatches, gather_output
    )
