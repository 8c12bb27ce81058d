"""Lambda layer (NHWC, Flax linen).

Reference: holocron/nn/modules/lambda_layer.py (itself adapted from lucidrains'
implementation of `LambdaNetworks <https://openreview.net/pdf?id=xTJEN-ggl1b>`_).
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..init import kaiming_normal

__all__ = ["LambdaLayer"]


class LambdaLayer(nn.Module):
    """Lambda layer: long-range interactions via content and position lambdas instead of
    attention maps.

    The einsum program matches the reference exactly up to NHWC layout: queries/keys/
    values come from 1x1 convs (q and v batch-normalized), keys are softmaxed over
    positions, the content lambda contracts positions, and the position lambda uses
    either a local 2D conv over values (receptive field ``r``) or a learned ``(n, n)``
    position embedding. Reference: holocron/nn/modules/lambda_layer.py:15-108.

    Args:
        out_channels: output channels (must divide by ``num_heads``)
        dim_k: key dimension
        n: total sequence length (h*w), required when ``r`` is None
        r: odd receptive field for the local-context position lambda
        num_heads: number of query heads
        dim_u: intra-depth dimension
    """

    out_channels: int
    dim_k: int
    n: Optional[int] = None
    r: Optional[int] = None
    num_heads: int = 4
    dim_u: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.out_channels % self.num_heads != 0:
            raise AssertionError("values dimension must be divisible by number of heads for multi-head query")
        dim_v = self.out_channels // self.num_heads
        u, heads, dk = self.dim_u, self.num_heads, self.dim_k
        b, h, w, _ = x.shape
        pos = h * w

        q = nn.Conv(dk * heads, (1, 1), use_bias=False, kernel_init=kaiming_normal(), name="to_q")(x)
        k = nn.Conv(dk * u, (1, 1), use_bias=False, kernel_init=kaiming_normal(), name="to_k")(x)
        v = nn.Conv(dim_v * u, (1, 1), use_bias=False, kernel_init=kaiming_normal(), name="to_v")(x)

        q = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="norm_q")(q)
        v = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="norm_v")(v)

        # channel splits mirror the reference's reshapes: q head-major, k/v dim-major
        q = q.reshape(b, pos, heads, dk)  # b n h k
        k = k.reshape(b, pos, dk, u)  # b m k u
        v = v.reshape(b, pos, dim_v, u)  # b m v u

        k = jax.nn.softmax(k, axis=1)  # over positions

        lam_c = jnp.einsum("bmku,bmvu->bkv", k, v)
        y_c = jnp.einsum("bnhk,bkv->bnhv", q, lam_c)

        if self.r is not None:
            if self.r % 2 != 1:
                raise AssertionError("Receptive kernel size should be odd")
            # local contexts: per-value-channel 2D conv mapping u -> dim_k over (h, w);
            # the reference phrases this as a conv3d with depth-1 kernel
            rkernel = self.param("R", jax.nn.initializers.normal(1.0), (self.r, self.r, u, dk))
            v_sp = v.reshape(b, h, w, dim_v, u)
            v_b = v_sp.transpose(0, 3, 1, 2, 4).reshape(b * dim_v, h, w, u)
            lam_p = jax.lax.conv_general_dilated(
                v_b,
                rkernel,
                window_strides=(1, 1),
                padding=((self.r // 2, self.r // 2), (self.r // 2, self.r // 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            lam_p = lam_p.reshape(b, dim_v, pos, dk).transpose(0, 2, 3, 1)  # b n k v
            y_p = jnp.einsum("bnhk,bnkv->bnhv", q, lam_p)
        else:
            if self.n is None:
                raise AssertionError("You must specify the total sequence length (h x w)")
            pos_emb = self.param("pos_emb", jax.nn.initializers.normal(1.0), (self.n, self.n, dk, u))
            lam_p = jnp.einsum("nmku,bmvu->bnkv", pos_emb, v)
            y_p = jnp.einsum("bnhk,bnkv->bnhv", q, lam_p)

        y = y_c + y_p  # (b, n, heads, dim_v)
        return y.reshape(b, h, w, heads * dim_v)
