"""Parameter-freezing and param-group utilities on variable pytrees.

Reference: holocron/trainer/utils.py. In the functional JAX design, "freezing" is a
boolean mask pytree consumed by ``optax.masked`` (zero updates for frozen leaves) and by
the train step (frozen BN statistics are not updated), rather than ``requires_grad``
mutation.
"""

import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax

__all__ = [
    "freeze_bn",
    "freeze_model",
    "module_forward_order",
    "norm_param_mask",
    "split_normalization_params",
    "trainable_mask",
]


def _path_str(path) -> str:
    return ".".join(str(getattr(p, "key", p)) for p in path)


def _natural_key(s: str):
    """block_10 sorts after block_2 (plain lexicographic order would not)."""
    return [int(tok) if tok.isdigit() else tok for tok in re.split(r"(\d+)", s)]


def module_forward_order(module, variables, input_shape, dtype=None) -> List[str]:
    """Records the module-call order of every submodule by tracing one forward pass.

    The reference freezes parameters in registration order, which torch guarantees
    matches forward order for its models (holocron/trainer/utils.py:56-66 — "Assumes
    layers have been registered in forward order"). Flax variable dicts are
    name-sorted, destroying that order ('head' sorts before 'stem_0'), so we recover
    it with a method interceptor under ``jax.eval_shape`` (trace-only: no FLOPs run).

    Returns dot-separated module paths, first-called first.
    """
    import flax.linen as nn
    import jax.numpy as jnp

    order: List[str] = []
    seen = set()

    def interceptor(next_fun, args, kwargs, context):
        path = ".".join(context.module.path)
        if path and path not in seen:
            seen.add(path)
            order.append(path)
        return next_fun(*args, **kwargs)

    dummy = jnp.zeros(input_shape, dtype) if dtype is not None else jnp.zeros(input_shape)
    with nn.intercept_methods(interceptor):
        jax.eval_shape(lambda v, x: module.apply(v, x, train=False), variables, dummy)
    return order


def _ordered_paths(params: Dict[str, Any], forward_order: Optional[Sequence[str]]) -> List[str]:
    """Flattened leaf paths sorted into forward order (natural-sorted fallback)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    paths = [_path_str(p) for p, _ in flat]
    if forward_order is None:
        return sorted(paths, key=_natural_key)
    index = {name: i for i, name in enumerate(forward_order)}

    def key(p: str):
        # longest recorded module path that prefixes this leaf's module path
        parts = p.split(".")
        for depth in range(len(parts) - 1, 0, -1):
            mod = ".".join(parts[:depth])
            if mod in index:
                return (index[mod], _natural_key(p))
        return (len(index), _natural_key(p))

    return sorted(paths, key=key)


def freeze_model(
    params: Dict[str, Any],
    last_frozen_layer: Optional[str] = None,
    forward_order: Optional[Sequence[str]] = None,
) -> Dict[str, Any]:
    """Builds a trainability mask freezing every parameter up to (and including) the
    ones whose path starts with ``last_frozen_layer``.

    Mirrors the reference's forward-order prefix freezing
    (holocron/trainer/utils.py:33-70). Pass ``forward_order`` (from
    :func:`module_forward_order`) for true call order — without it, paths are
    natural-sorted, which matches forward order only for ``features_*``-style
    naming where stages enclose everything (NOT for ResNet-style trees where
    ``head`` sorts before ``stem``).
    """
    if last_frozen_layer is None:
        return jax.tree.map(lambda _: True, params)
    paths = _ordered_paths(params, forward_order)
    if not any(p.startswith(last_frozen_layer) for p in paths):
        raise ValueError(f"Unable to locate child module {last_frozen_layer}")
    mask_by_path = {}
    layer_reached = False
    done = False
    for p in paths:
        matches = p.startswith(last_frozen_layer)
        if done:
            mask_by_path[p] = True
        elif not layer_reached or matches:
            mask_by_path[p] = False
        else:
            mask_by_path[p] = True
        if matches:
            layer_reached = True
        elif layer_reached:
            done = True
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    return jax.tree_util.tree_unflatten(treedef, [mask_by_path[_path_str(p)] for p, _ in flat])


def trainable_mask(
    params: Dict[str, Any],
    last_frozen_layer: Optional[str] = None,
    forward_order: Optional[Sequence[str]] = None,
) -> Dict[str, Any]:
    """Alias of :func:`freeze_model` with a clearer name for the optax use."""
    return freeze_model(params, last_frozen_layer, forward_order)


def freeze_bn(params_mask: Dict[str, Any], batch_stats: Dict[str, Any]) -> Dict[str, Any]:
    """Builds a batch-stats update mask freezing the running statistics of every norm
    layer whose parameters are themselves frozen.

    Functional analog of the reference's ``freeze_bn`` (holocron/trainer/utils.py:14-31),
    which switches frozen-affine BatchNorm modules to eval so their running stats stop
    tracking. Here "frozen" is read off ``params_mask`` (the trainability mask from
    :func:`freeze_model`): a stat leaf is updated (True) only if at least one sibling
    parameter of the same module is trainable.
    """

    def module_trainable(mask_sub) -> bool:
        return any(jax.tree.leaves(mask_sub)) if mask_sub is not None else True

    def walk(stats, mask):
        if not isinstance(stats, dict):
            return module_trainable(mask)
        out = {}
        for k, v in stats.items():
            # stat leaves (mean/var) don't exist under params: decide from the module's
            # sibling parameters (scale/bias) — i.e. the enclosing mask subtree
            sub = mask.get(k, mask) if isinstance(mask, dict) else mask
            out[k] = walk(v, sub)
        return out

    return walk(batch_stats, params_mask)


def norm_param_mask(params: Dict[str, Any]) -> Dict[str, Any]:
    """True for parameters belonging to normalization layers.

    Convention: a module dict whose keys are a subset of ``{scale, bias}`` is a norm
    layer (BatchNorm2d / LayerNorm); conv/dense modules always carry a ``kernel``.
    """

    def walk(tree):
        if isinstance(tree, dict):
            if tree and set(tree.keys()) <= {"scale", "bias"}:
                return {k: True for k in tree}
            return {k: walk(v) for k, v in tree.items()}
        return False

    return walk(params)


def split_normalization_params(params: Dict[str, Any]) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Returns (norm_mask, other_mask) — the two param groups the reference splits for
    per-group weight decay (holocron/trainer/utils.py:73-98)."""
    norm = norm_param_mask(params)
    other = jax.tree.map(lambda m: not m, norm)
    return norm, other
