"""Parameter-freezing and param-group utilities on variable pytrees.

Reference: holocron/trainer/utils.py. In the functional JAX design, "freezing" is a
boolean mask pytree consumed by ``optax.masked`` (zero updates for frozen leaves) and by
the train step (frozen BN statistics are not updated), rather than ``requires_grad``
mutation.
"""

from typing import Any, Dict, Optional, Tuple

import jax

__all__ = ["freeze_bn", "freeze_model", "norm_param_mask", "split_normalization_params", "trainable_mask"]


def _path_str(path) -> str:
    return ".".join(str(getattr(p, "key", p)) for p in path)


def freeze_model(params: Dict[str, Any], last_frozen_layer: Optional[str] = None) -> Dict[str, Any]:
    """Builds a trainability mask freezing every parameter up to (and including) the
    ones whose path starts with ``last_frozen_layer``.

    Mirrors the reference's forward-order prefix freezing
    (holocron/trainer/utils.py:33-70) on the flattened variable tree (note: flax
    flattening is name-ordered, which matches forward order for this package's
    ``stage_i``/``layer_i_j`` naming).
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    if last_frozen_layer is None:
        return jax.tree.map(lambda _: True, params)
    paths = [_path_str(p) for p, _ in flat]
    if not any(p.startswith(last_frozen_layer) for p in paths):
        raise ValueError(f"Unable to locate child module {last_frozen_layer}")
    mask_flat = []
    layer_reached = False
    done = False
    for p in paths:
        matches = p.startswith(last_frozen_layer)
        if done:
            mask_flat.append(True)
        elif not layer_reached or matches:
            mask_flat.append(False)
        else:
            mask_flat.append(True)
        if matches:
            layer_reached = True
        elif layer_reached:
            done = True
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, mask_flat)


def trainable_mask(params: Dict[str, Any], last_frozen_layer: Optional[str] = None) -> Dict[str, Any]:
    """Alias of :func:`freeze_model` with a clearer name for the optax use."""
    return freeze_model(params, last_frozen_layer)


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
