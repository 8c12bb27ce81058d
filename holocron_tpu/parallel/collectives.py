"""Thin named-axis collective wrappers — the ICI analog of a NCCL backend.

The reference has no communication layer at all (SURVEY.md §2i); on TPU, XLA owns the
collectives, so this module only names them for use inside ``shard_map``-style code.
Inside a plain ``jax.jit`` over a mesh these are unnecessary — XLA derives reductions
from shardings — but explicit versions are useful for hand-scheduled steps.
"""

import jax

__all__ = ["psum", "pmean", "all_gather", "ppermute", "reduce_scatter", "axis_index", "axis_size"]


def psum(x, axis_name: str = "data"):
    return jax.lax.psum(x, axis_name)


def pmean(x, axis_name: str = "data"):
    return jax.lax.pmean(x, axis_name)


def all_gather(x, axis_name: str = "data", axis: int = 0, tiled: bool = True):
    return jax.lax.all_gather(x, axis_name, axis=axis, tiled=tiled)


def ppermute(x, perm, axis_name: str = "data"):
    return jax.lax.ppermute(x, axis_name, perm)


def reduce_scatter(x, axis_name: str = "data", scatter_dimension: int = 0):
    return jax.lax.psum_scatter(x, axis_name, scatter_dimension=scatter_dimension, tiled=True)


def axis_index(axis_name: str = "data"):
    return jax.lax.axis_index(axis_name)


def axis_size(axis_name: str = "data"):
    return jax.lax.axis_size(axis_name)
