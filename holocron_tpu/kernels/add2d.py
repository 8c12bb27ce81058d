"""Pallas TPU kernel for the AdderNet cross-correlation: ``out = -sum_d |p - w|``.

The XLA fallback (holocron_tpu/nn/functional.py:add2d) materializes the full
``(L, D, O)`` broadcast of ``|patches - weights|`` in HBM — O(L*D*O) memory traffic.
This kernel tiles the computation like a matmul: per ``(TL, TO)`` output tile it streams
``D`` in chunks through VMEM, accumulating the L1 distances on the VPU, so HBM traffic
drops to the matmul-like O(L*D + D*O + L*O).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["add2d_matmul"]


def _add2d_kernel(p_ref, w_ref, o_ref, *, d_chunk: int, num_chunks: int):
    tl, _ = p_ref.shape
    _, to = w_ref.shape

    def body(i, acc):
        p = p_ref[:, pl.ds(i * d_chunk, d_chunk)].astype(jnp.float32)  # (TL, DC)
        w = w_ref[pl.ds(i * d_chunk, d_chunk), :].astype(jnp.float32)  # (DC, TO)
        return acc + jnp.sum(jnp.abs(p[:, :, None] - w[None, :, :]), axis=1)

    acc = jax.lax.fori_loop(0, num_chunks, body, jnp.zeros((tl, to), jnp.float32))
    o_ref[:] = (-acc).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def add2d_matmul(patches: jax.Array, weight: jax.Array, interpret: bool = False) -> jax.Array:
    """``out[l, o] = -sum_d |patches[l, d] - weight[d, o]|``.

    Args:
        patches: ``(L, D)`` im2col'd input slices
        weight: ``(D, O)`` flattened filters
        interpret: run in the Pallas interpreter (for CPU tests)
    """
    l, d = patches.shape
    _, o = weight.shape

    tile_l, tile_o, d_chunk = 128, 128, 128
    lp, dp, op = _round_up(l, tile_l), _round_up(d, d_chunk), _round_up(o, tile_o)
    # pad with matching values so padded d-positions contribute |0 - 0| = 0
    p_pad = jnp.pad(patches, ((0, lp - l), (0, dp - d)))
    w_pad = jnp.pad(weight, ((0, dp - d), (0, op - o)))

    out = pl.pallas_call(
        functools.partial(_add2d_kernel, d_chunk=d_chunk, num_chunks=dp // d_chunk),
        grid=(lp // tile_l, op // tile_o),
        in_specs=[
            pl.BlockSpec((tile_l, dp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dp, tile_o), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_l, tile_o), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((lp, op), patches.dtype),
        cost_estimate=pl.CostEstimate(
            flops=3 * lp * dp * op, bytes_accessed=(lp * dp + dp * op + lp * op) * 4, transcendentals=0
        ),
        interpret=interpret,
    )(p_pad, w_pad)
    return out[:l, :o]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def add2d_matmul_ad(patches: jax.Array, weight: jax.Array, interpret: bool = False) -> jax.Array:
    """Differentiable wrapper: Pallas forward, XLA sign-based backward."""
    return add2d_matmul(patches, weight, interpret)


def _add2d_fwd(patches, weight, interpret):
    return add2d_matmul(patches, weight, interpret), (patches, weight)


def _add2d_bwd(interpret, residuals, g):
    """d(-|p - w|)/dp = -sign(p - w), contracted against the cotangent.

    The sign broadcast is ``(L, D, O)`` — materializing it whole is what the forward
    kernel exists to avoid, so the backward scans over O-chunks sized to a fixed
    element budget: peak memory is O(L*D + D*O + L*D*chunk) instead of O(L*D*O).
    """
    patches, weight = residuals
    l, d = patches.shape
    o = weight.shape[1]
    budget = 1 << 23  # broadcast elements per scan step (~32 MiB f32)
    chunk = int(min(o, max(1, budget // max(l * d, 1))))
    num = -(-o // chunk)
    o_pad = num * chunk
    # padded outputs carry g = 0, so they contribute nothing to either gradient
    w_c = jnp.pad(weight, ((0, 0), (0, o_pad - o))).reshape(d, num, chunk).transpose(1, 0, 2)
    g_c = jnp.pad(g, ((0, 0), (0, o_pad - o))).reshape(l, num, chunk).transpose(1, 0, 2)

    def body(dp_acc, inp):
        w_i, g_i = inp  # (D, C), (L, C)
        sign = jnp.sign(patches[:, :, None] - w_i[None, :, :])  # (L, D, C)
        dp_acc = dp_acc - jnp.einsum("lc,ldc->ld", g_i, sign)
        return dp_acc, jnp.einsum("lc,ldc->dc", g_i, sign)

    dp, dw_chunks = jax.lax.scan(body, jnp.zeros((l, d), patches.dtype), (w_c, g_c))
    dw = dw_chunks.transpose(1, 0, 2).reshape(d, o_pad)[:, :o].astype(weight.dtype)
    return dp, dw


add2d_matmul_ad.defvjp(_add2d_fwd, _add2d_bwd)
