"""Pallas TPU kernel for involution (`Li et al. <https://arxiv.org/pdf/2103.06255.pdf>`_).

Involution applies a per-position, per-group kernel field to a k x k neighborhood:
``out[p, c] = sum_taps kern[p, group(c), tap] * x[p + tap_offset, c]``. The XLA
formulations all lose badly here (measured at N32/56px/C128/G8/k7):

- unfold multiply-add (the torch translation): 22 GB of HBM traffic, 27.7 ms
- shift-and-accumulate with a grouped (…, G, C/G) layout: 16-wide lanes, 106 ms
- shift-and-accumulate over a materialized full-C kernel field: 10.1 ms

because the kernel field is K^2 x the image and per-position (zero reuse), XLA either
materializes it or re-reads x K^2 times. This kernel keeps ONE padded sample plus its
kernel field resident in VMEM and runs all K^2 taps on the VPU, expanding the G->C
broadcast with a tiny 0/1 matmul on the MXU. Measured: 0.77 ms — 36x over the best
XLA form (see docs/PERF.md).

Reference op: holocron/nn/modules/conv.py:441-499.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["involution_stencil", "involution_stencil_ad", "vmem_estimate"]


def _involution_kernel(xp_ref, k_ref, o_ref, *, k: int, groups: int):
    _, h, w, c = o_ref.shape
    cg = c // groups
    # G -> C expansion as a 0/1 matmul (Mosaic-safe; avoids lane reshapes):
    # expand[g, c] = 1 iff c // cg == g
    expand = (
        jax.lax.broadcasted_iota(jnp.int32, (groups, c), 1) // cg
        == jax.lax.broadcasted_iota(jnp.int32, (groups, c), 0)
    ).astype(jnp.float32)
    acc = jnp.zeros((h, w, c), jnp.float32)
    for idx in range(k * k):  # static unroll: row-major taps (matches the unfold)
        dy, dx = divmod(idx, k)
        window = xp_ref[0, dy : dy + h, dx : dx + w, :].astype(jnp.float32)
        ktap = k_ref[0, :, :, idx * groups : (idx + 1) * groups].astype(jnp.float32)
        kfull = jnp.dot(ktap.reshape(h * w, groups), expand).reshape(h, w, c)
        acc = acc + kfull * window
    o_ref[0] = acc.astype(o_ref.dtype)


def vmem_estimate(n, hp, wp, h, w, c, groups, k, x_bytes: int = 2, k_bytes: int = 2) -> int:
    """Per-sample VMEM footprint in bytes: the three blocks double-buffered (grid
    pipelining) plus the f32 accumulator/window/kfull intermediates."""
    blocks = hp * wp * c * x_bytes + h * w * groups * k * k * k_bytes + h * w * c * x_bytes
    return 2 * blocks + 3 * h * w * c * 4


@functools.partial(jax.jit, static_argnames=("k", "groups", "interpret"))
def involution_stencil(
    xp: jax.Array, kern: jax.Array, k: int, groups: int, interpret: bool = False
) -> jax.Array:
    """Applies the involution stencil (stride 1, dilation 1).

    Args:
        xp: ``(N, H + k - 1, W + k - 1, C)`` — the PRE-PADDED input
        kern: ``(N, H, W, K^2 * G)`` kernel field, tap-major channels
            (channel = tap * G + g; transpose from the span conv's g-major order
            before calling)
        k: kernel size; groups: G (C must be divisible)
        interpret: run in the Pallas interpreter (CPU tests)
    """
    n, hp, wp, c = xp.shape
    h, w = hp - (k - 1), wp - (k - 1)
    return pl.pallas_call(
        functools.partial(_involution_kernel, k=k, groups=groups),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hp, wp, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, k * k * groups), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), xp.dtype),
        cost_estimate=pl.CostEstimate(
            flops=3 * n * h * w * c * k * k,
            bytes_accessed=2 * n * (hp * wp * c + h * w * groups * k * k + h * w * c),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, kern)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def involution_stencil_ad(xp, kern, k: int, groups: int, interpret: bool = False):
    """Differentiable wrapper: Pallas forward, XLA shift-accumulate backward."""
    return involution_stencil(xp, kern, k, groups, interpret)


def _involution_fwd(xp, kern, k, groups, interpret):
    return involution_stencil(xp, kern, k, groups, interpret), (xp, kern)


def _involution_bwd(k, groups, interpret, residuals, g):
    xp, kern = residuals
    n, hp, wp, c = xp.shape
    h, w = hp - (k - 1), wp - (k - 1)
    cg = c // groups
    dxp = jnp.zeros_like(xp)
    dkern_taps = []
    for idx in range(k * k):
        dy, dx = divmod(idx, k)
        window = jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (n, h, w, c))
        ktap = jax.lax.dynamic_slice(kern, (0, 0, 0, idx * groups), (n, h, w, groups))
        kfull = jnp.repeat(ktap, cg, axis=-1)
        dxp = jax.lax.dynamic_update_slice(
            dxp, jax.lax.dynamic_slice(dxp, (0, dy, dx, 0), (n, h, w, c)) + kfull * g, (0, dy, dx, 0)
        )
        dkern_taps.append(jnp.sum((window * g).reshape(n, h, w, groups, cg), axis=-1))
    dkern = jnp.concatenate(dkern_taps, axis=-1).astype(kern.dtype)
    return dxp.astype(xp.dtype), dkern


involution_stencil_ad.defvjp(_involution_fwd, _involution_bwd)
