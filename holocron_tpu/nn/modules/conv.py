"""Exotic convolution modules (NHWC, Flax linen).

Reference: holocron/nn/modules/conv.py.
"""

import contextlib
import math
import threading
from typing import List, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import functional as F
from ..functional import _pair
from ..init import kaiming_normal

__all__ = ["Add2d", "Involution2d", "NormConv2d", "PyConv2d", "SlimConv2d"]

_PAD_MODES = {"zeros": "constant", "reflect": "reflect", "replicate": "edge", "circular": "wrap"}

# Auto-rule crossover for the masked-dense grouped-conv execution: XLA's grouped
# emitter packs the batch into sublanes, so it recovers once the batch is deep
# enough; below this batch (and with per-group inputs narrower than 32 lanes) the
# block-diagonal dense form wins by 27-77x (measured on v5e, docs/PERF.md).
DENSE_GROUPS_MAX_BATCH = 32

# How many ways the batch dim is sharded over a data-parallel mesh. The cliff is a
# PER-DEVICE property: a global batch of 64 spread over 8 chips executes as batch 8
# per chip — deep inside the cliff — so sharded runners (shard_inference, the
# Trainer) declare their data-axis size here before tracing and the auto rule keys
# on the per-device batch. Default 1 = unsharded/single-chip. THREAD-LOCAL: a
# serving thread tracing a single-device model concurrently with a sharded
# callable's scoped declaration on another thread must not observe it.
_DATA_SHARDS_TLS = threading.local()


def _get_data_shards() -> int:
    return getattr(_DATA_SHARDS_TLS, "n", 1)


def set_data_shards(n: int) -> None:
    """Declares the data-axis shard count consulted by :func:`masked_dense_groups_wins`
    (for the CURRENT thread).

    Affects functions traced AFTER the call (jit caches built earlier keep their
    choice). Prefer the scoped :func:`data_shards` — sharded runners trace inside
    it so the declaration can never leak into later unrelated single-device models."""
    _DATA_SHARDS_TLS.n = max(int(n), 1)


@contextlib.contextmanager
def data_shards(n: int):
    """Scopes :func:`set_data_shards` to a with-block (and restores the previous
    value on exit). ``shard_inference``'s returned callable and the trainer's step
    dispatch wrap every call in this, so the per-device rule is active exactly while
    THEIR jits trace (every call, not just the first: a new batch shape retraces
    later and must see the same declaration). The state is thread-local, so other
    threads tracing unrelated models concurrently are unaffected."""
    prev = _get_data_shards()
    _DATA_SHARDS_TLS.n = max(int(n), 1)
    try:
        yield
    finally:
        _DATA_SHARDS_TLS.n = prev


def masked_dense_groups_wins(batch: int, in_per_group: int) -> bool:
    """Measured auto rule: narrow per-group contractions under-fill the MXU and hit
    XLA's small-batch grouped-emitter cliff; depthwise (in_per_group == 1) is
    excluded — XLA has a dedicated lowering for it that is already fast at batch 1
    (rexnet/mobileone measure at full speed). ``batch`` is the global batch; the
    rule divides by the declared data-shard count (:func:`set_data_shards`) since
    the cliff is per-device."""
    per_device = -(-batch // _get_data_shards())
    return 1 < in_per_group < 32 and per_device <= DENSE_GROUPS_MAX_BATCH


def _explicit_pad(x: jax.Array, padding: Tuple[int, int], padding_mode: str) -> jax.Array:
    ph, pw = padding
    return jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), mode=_PAD_MODES[padding_mode])


class _SliceConv(nn.Module):
    """Shared parameter plumbing for the im2col-based conv variants
    (holocron/nn/modules/conv.py:21-52)."""

    out_channels: int
    kernel_size: Union[int, Tuple[int, int]]
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    dilation: Union[int, Tuple[int, int]] = 1
    use_bias: bool = True
    padding_mode: str = "zeros"
    eps: float = 1e-14

    def _weight_and_bias(self, in_channels: int):
        kh, kw = _pair(self.kernel_size)
        # match torch conv init: kaiming_uniform(a=sqrt(5)) ~ U(-b, b), b = 1/sqrt(fan_in)
        fan_in = in_channels * kh * kw
        bound = 1.0 / math.sqrt(fan_in)
        weight = self.param(
            "kernel",
            lambda k, s: jax.random.uniform(k, s, minval=-bound * math.sqrt(3), maxval=bound * math.sqrt(3)),
            (kh, kw, in_channels, self.out_channels),
        )
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias",
                lambda k, s: jax.random.uniform(k, s, minval=-bound, maxval=bound),
                (self.out_channels,),
            )
        return weight, bias

    def _padded_input(self, x: jax.Array):
        pad = _pair(self.padding)
        if self.padding_mode != "zeros":
            return _explicit_pad(x, pad, self.padding_mode), (0, 0)
        return x, pad


class NormConv2d(_SliceConv):
    """Normalized convolution (`Kim <https://arxiv.org/pdf/2005.05274v2.pdf>`_): a conv
    applied to variance-normalized input slices.

    Reference: holocron/nn/modules/conv.py:55-148. NHWC input; HWIO kernel param.
    """

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        weight, bias = self._weight_and_bias(x.shape[-1])
        x, pad = self._padded_input(x)
        return F.norm_conv2d(x, weight, bias, self.stride, pad, self.dilation, self.eps)


class Add2d(_SliceConv):
    """AdderNet layer (`Chen et al. <https://arxiv.org/pdf/1912.13200.pdf>`_):
    ``-sum |patch - w|`` in place of the dot product.

    Reference: holocron/nn/modules/conv.py:150-248.
    """

    normalize_slices: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        weight, bias = self._weight_and_bias(x.shape[-1])
        x, pad = self._padded_input(x)
        return F.add2d(x, weight, bias, self.stride, pad, self.dilation, self.normalize_slices, self.eps)


class SlimConv2d(nn.Module):
    """SlimConv (`Qiu et al. <https://arxiv.org/pdf/2003.07469.pdf>`_): SE-style channel
    weights, a flipped second pathway, halved reconstruction, two transform branches
    (3x3 top; 1x1->3x3 bottom), channel concat.

    Output channels: ``in_c // 2 + in_c // 4``. Reference: holocron/nn/modules/conv.py:251-370.
    """

    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    dilation: Union[int, Tuple[int, int]] = 1
    use_bias: bool = True
    r: int = 32
    L: int = 2

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_c = x.shape[-1]
        squeezed = max(in_c // self.r, self.L)
        # channel-wise weights
        z = jnp.mean(x, axis=(1, 2), keepdims=True)
        z = nn.Conv(squeezed, (1, 1), kernel_init=kaiming_normal(), name="fc1")(z)
        z = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn")(z)
        z = nn.Conv(in_c, (1, 1), kernel_init=kaiming_normal(), name="fc2")(jax.nn.relu(z))
        w = jax.nn.sigmoid(z)

        half = in_c // 2
        x_w = x * w
        x_top = x_w[..., :half] + x_w[..., half:]
        x_w = x * jnp.flip(w, axis=-1)
        x_bot = x_w[..., :half] + x_w[..., half:]

        conv_kw = {
            "kernel_size": _pair(self.kernel_size),
            "strides": _pair(self.stride),
            "padding": _pair(self.padding),
            "kernel_dilation": _pair(self.dilation),
            "use_bias": self.use_bias,
            "kernel_init": kaiming_normal(),
        }
        x_top = nn.Conv(half, name="conv_top", **conv_kw)(x_top)
        x_bot = nn.Conv(in_c // 4, (1, 1), kernel_init=kaiming_normal(), name="conv_bot1")(x_bot)
        x_bot = nn.Conv(in_c // 4, name="conv_bot2", **conv_kw)(x_bot)
        return jnp.concatenate([x_top, x_bot], axis=-1)


class _MaskedDenseGroupConv(nn.Module):
    """Grouped conv executed as a DENSE conv with a block-diagonal kernel.

    Grouped convs whose per-group contraction is narrower than the MXU's 128 lanes
    leave the systolic array almost idle: XLA's grouped-conv emitter falls back to a
    window-walking schedule measured at 28 ms for ONE 9x9 g=16 conv on a 112px
    batch-1 input (pyconv_resnet50's level3, docs/PERF.md) — slower than the entire
    rest of the network. Expanding the grouped kernel to a zero-padded dense one
    costs ``groups`` x the FLOPs but runs as a single full-tile MXU conv, which is
    orders of magnitude faster at these widths.

    The parameter keeps the grouped ``(kh, kw, in/groups, out)`` layout (identical
    names, shapes, init and checkpoint conversion as ``nn.Conv`` with
    ``feature_group_count``) — only the execution differs, and the zero expansion
    folds into the jit (a constant under the const-weights deploy protocol).
    """

    features: int
    kernel_size: Tuple[int, int]
    groups: int
    strides: Tuple[int, int] = (1, 1)
    padding: Union[int, str, Tuple[int, int]] = 0
    kernel_dilation: Tuple[int, int] = (1, 1)
    use_bias: bool = True
    kernel_init: Optional[object] = None
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        g = self.groups
        in_pg = x.shape[-1] // g
        out_pg = self.features // g
        kernel = self.param(
            "kernel", self.kernel_init or kaiming_normal(), (kh, kw, in_pg, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,)) if self.use_bias else None
        if self.dtype is not None:
            x, kernel = x.astype(self.dtype), kernel.astype(self.dtype)
            bias = None if bias is None else bias.astype(self.dtype)
        # block-diagonal expansion: input channel G*in_pg+i feeds output channel
        # go*out_pg+o iff G == go; everything off-group is an exact zero
        k5 = kernel.reshape(kh, kw, in_pg, g, out_pg)  # (h, w, i, go, o)
        eye = jnp.eye(g, dtype=kernel.dtype)  # (G, go)
        dense = jnp.einsum("hwigo,Gg->hwGigo", k5, eye).reshape(kh, kw, g * in_pg, g * out_pg)
        if isinstance(self.padding, str):
            padding = self.padding
        else:
            ph, pw = _pair(self.padding)
            padding = ((ph, ph), (pw, pw))
        out = jax.lax.conv_general_dilated(
            x,
            dense,
            window_strides=self.strides,
            padding=padding,
            rhs_dilation=self.kernel_dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out if bias is None else out + bias


class PyConv2d(nn.Module):
    """Pyramidal convolution (`Duta et al. <https://arxiv.org/pdf/2006.11538.pdf>`_):
    parallel convs with growing kernel sizes / groups, outputs channel-concatenated.

    Reference: holocron/nn/modules/conv.py:373-438 (incl. the power-of-two channel split
    and default group schedule). Grouped levels whose per-group input width is below
    the MXU lane count execute via :class:`_MaskedDenseGroupConv` (same parameters,
    measured orders-of-magnitude faster on TPU — docs/PERF.md); set
    ``dense_groups=False`` to force XLA's native grouped lowering.
    """

    out_channels: int
    kernel_size: int
    num_levels: int = 2
    padding: int = 0
    groups: Optional[Sequence[int]] = None
    use_bias: bool = True
    stride: int = 1
    dtype: Optional[object] = None
    dense_groups: Optional[bool] = None  # None = auto (dense when in/g < 32)

    def _level_plan(self) -> Tuple[List[int], List[int], List[int], List[int]]:
        if self.num_levels == 1:
            g = self.groups[0] if isinstance(self.groups, (list, tuple)) else 1
            return [self.out_channels], [self.kernel_size], [self.padding], [g]
        exp2 = int(math.log2(self.num_levels))
        reminder = self.num_levels - 2**exp2
        out_chans = [self.out_channels // 2 ** (exp2 + 1)] * (2 * reminder) + [
            self.out_channels // 2**exp2
        ] * (self.num_levels - 2 * reminder)
        k_sizes = [self.kernel_size + 2 * idx for idx in range(self.num_levels)]
        if self.groups is None:
            groups = [1] + [
                min(2 ** (2 + idx), out_chan) for idx, out_chan in zip(range(self.num_levels - 1), out_chans[1:])
            ]
        else:
            if not isinstance(self.groups, (list, tuple)) or len(self.groups) != self.num_levels:
                raise ValueError("The argument `groups` is expected to be a list of integer of size `num_levels`.")
            groups = list(self.groups)
        paddings = [self.padding + idx for idx in range(self.num_levels)]
        return out_chans, k_sizes, paddings, groups

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out_chans, k_sizes, paddings, groups = self._level_plan()
        outs = []
        for idx, (oc, k, p, g) in enumerate(zip(out_chans, k_sizes, paddings, groups)):
            use_dense = (
                self.dense_groups
                if self.dense_groups is not None
                else masked_dense_groups_wins(x.shape[0], x.shape[-1] // g)
            )
            if g > 1 and use_dense:
                conv = _MaskedDenseGroupConv(
                    oc,
                    (k, k),
                    groups=g,
                    strides=(self.stride, self.stride),
                    padding=p,
                    use_bias=self.use_bias,
                    kernel_init=kaiming_normal(),
                    dtype=self.dtype,
                    name=f"level{idx}",
                )
            else:
                conv = nn.Conv(
                    oc,
                    (k, k),
                    strides=(self.stride, self.stride),
                    padding=p,
                    feature_group_count=g,
                    use_bias=self.use_bias,
                    kernel_init=kaiming_normal(),
                    dtype=self.dtype,
                    name=f"level{idx}",
                )
            outs.append(conv(x))
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)


class Involution2d(nn.Module):
    """Involution (`Li et al. <https://arxiv.org/pdf/2103.06255.pdf>`_): the kernel is
    generated from the input (reduce -> span), then applied via unfolded multiply-add.

    Reference: holocron/nn/modules/conv.py:441-499. NHWC.
    """

    kernel_size: int
    padding: int = 0
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    reduction_ratio: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n, h, w, c = x.shape
        k = self.kernel_size
        g = self.groups

        kern_in = x
        if self.stride > 1:
            kern_in = nn.avg_pool(x, (self.stride, self.stride), strides=(self.stride, self.stride))
        kern = nn.Conv(int(c // self.reduction_ratio), (1, 1), kernel_init=kaiming_normal(), name="reduce")(kern_in)
        kern = nn.Conv(k**2 * g, (1, 1), kernel_init=kaiming_normal(), name="span")(kern)
        oh, ow = kern.shape[1], kern.shape[2]
        pad = self.padding
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0))) if pad else x

        # Pallas fast path (stride/dilation 1, sample fits VMEM): keeps one padded
        # sample + its kernel field resident in VMEM — measured 0.91 ms vs 27.7 ms
        # for the unfold form and 10.1 ms for the best pure-XLA form at
        # N32/56px/C128/G8/k7 (docs/PERF.md). Kernel wants tap-major channels.
        if self.stride == 1 and self.dilation == 1:
            from ...kernels.involution import involution_stencil_ad, vmem_estimate

            backend = jax.default_backend()
            itemsize = jnp.dtype(x.dtype).itemsize
            fits = vmem_estimate(
                n, xp.shape[1], xp.shape[2], oh, ow, c, g, k, itemsize, itemsize
            ) < 14 * 2**20
            if fits:
                kern_t = jnp.swapaxes(kern.reshape(n, oh, ow, g, k**2), -1, -2)
                return involution_stencil_ad(
                    xp, kern_t.reshape(n, oh, ow, k**2 * g).astype(x.dtype), k, g, backend != "tpu"
                )

        # XLA fallback (strided/dilated or VMEM-oversized): shift-and-accumulate over
        # the taps against a materialized full-C kernel field — the fastest measured
        # pure-XLA formulation (the grouped-lane variant is 10x worse).
        kern_full = jnp.broadcast_to(
            kern.reshape(n, oh, ow, g, 1, k**2), (n, oh, ow, g, c // g, k**2)
        ).reshape(n, oh, ow, c, k**2)
        y_span = (oh - 1) * self.stride + 1
        x_span = (ow - 1) * self.stride + 1
        out = jnp.zeros((n, oh, ow, c), x.dtype)
        for idx in range(k * k):  # row-major tap order (matches the unfold/torch)
            dy, dx = divmod(idx, k)
            ys, xs = dy * self.dilation, dx * self.dilation
            sl = xp[:, ys : ys + y_span : self.stride, xs : xs + x_span : self.stride]
            out = out + kern_full[..., idx] * sl
        return out
