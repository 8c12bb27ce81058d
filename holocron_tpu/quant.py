"""Post-training int8 quantization for deploy-form inference.

TPU-native extension (the reference ships no quantization — verified by grep of
/root/reference for quant/int8/qat: nothing): the v5e MXU executes int8 matmuls at
~2x the bf16 rate (393.8 TOPS vs 196.9 TFLOP/s), so a weight+activation int8 conv
path roughly doubles the roofline of MXU-bound inference. Deploy-form RepVGG /
MobileOne (post-``reparametrize``) are plain conv stacks — the ideal target.

Design (no model code changes — works on ANY linen model in the zoo):

- **Weights**: per-output-channel symmetric int8, ``s_w[o] = max|K[..., o]| / 127``.
- **Activations**: per-tensor symmetric int8. Scales are **calibrated** by running
  sample batches under a :func:`flax.linen.intercept_methods` interceptor that sows
  each conv input's abs-max into a ``quant_stats`` collection (max-reduced across
  batches) — all under jit, no eager dispatch. Without calibration data the scale is
  computed **dynamically** per call (one extra reduction per conv).
- **Compute**: ``conv(int8, int8) -> int32`` accumulation on the MXU
  (``preferred_element_type=jnp.int32``), then a float requantize
  ``y = acc * (s_x * s_w) + bias`` fused by XLA into the conv epilogue, where
  ``s_x = absmax(x)/127`` and ``s_w = absmax(K)/127`` already carry the /127
  factors (i.e. in raw abs-maxes: ``acc * absmax_x * absmax_w / 127^2``).

The quantized forward runs through the *original module* with the conv calls
intercepted, so architecture code never needs a quantized variant.
"""

from typing import Dict, Iterable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["calibrate", "quantize_conv_params", "quantize_model", "QuantizedModel"]

QINT_MAX = 127.0


def _as_pairs(value, n: int) -> Tuple[Tuple[int, int], ...]:
    """Normalizes linen Conv padding to ``((lo, hi), ...)`` per spatial dim."""
    if isinstance(value, int):
        return ((value, value),) * n
    pads = []
    for v in value:
        pads.append((v, v) if isinstance(v, int) else tuple(v))
    return tuple(pads)


def _conv_geometry(m: nn.Conv, n_spatial: int):
    """Extracts (strides, padding, kernel_dilation, groups) in lax-ready form,
    mirroring linen's int->tuple broadcasting."""
    def tup(v):
        return (v,) * n_spatial if isinstance(v, int) else tuple(v)

    padding = m.padding
    if not isinstance(padding, str):
        padding = _as_pairs(padding, n_spatial)
    return tup(m.strides or 1), padding, tup(m.kernel_dilation or 1), m.feature_group_count


def _is_quantizable_conv(module, method_name: str) -> bool:
    # type(...) is nn.Conv rather than isinstance: nn.ConvLocal etc. subclasses have
    # different kernel semantics. Convs using linen features the int8 replacement
    # does not implement (input dilation, weight masks) fall through untouched.
    if type(module) is not nn.Conv or method_name != "__call__":
        return False
    input_dilation = getattr(module, "input_dilation", None)
    if input_dilation is not None:
        dils = (input_dilation,) if isinstance(input_dilation, int) else tuple(input_dilation)
        if any(d != 1 for d in dils):
            return False
    return getattr(module, "mask", None) is None


def _path_key(path: Tuple[str, ...]) -> str:
    return "/".join(path)


# ---------------------------------------------------------------------------
# calibration
# ---------------------------------------------------------------------------
def calibrate(module, variables, batches: Iterable[jax.Array], **apply_kwargs) -> Dict[str, float]:
    """Runs ``batches`` through the model, recording each conv input's abs-max.

    Returns ``{conv_path: activation_scale}`` where scale is the abs-max observed
    across all batches (symmetric per-tensor calibration). Runs fully jitted.
    """

    def record(next_fn, args, kwargs, context):
        if _is_quantizable_conv(context.module, context.method_name):
            x = args[0]
            context.module.sow(
                "quant_stats",
                "in_absmax",
                jnp.max(jnp.abs(x)).astype(jnp.float32),
                reduce_fn=jnp.maximum,
                init_fn=lambda: jnp.float32(0.0),
            )
        return next_fn(*args, **kwargs)

    def apply_fn(v, x):
        with nn.intercept_methods(record):
            _, mut = module.apply(v, x, mutable=["quant_stats"], **apply_kwargs)
        return mut["quant_stats"]

    jit_apply = jax.jit(apply_fn)
    scales: Dict[str, float] = {}
    for batch in batches:
        stats = jax.device_get(jit_apply(variables, batch))
        for path, leaf in _flatten_with_path(stats):
            # sow leaves are stored under <conv-path>/in_absmax
            key = _path_key(path[:-1])
            scales[key] = max(scales.get(key, 0.0), float(jnp.asarray(leaf).max()))
    return scales


def _flatten_with_path(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten_with_path(v, prefix + (k,))
    else:
        yield prefix, tree


# ---------------------------------------------------------------------------
# weight quantization
# ---------------------------------------------------------------------------
def quantize_conv_params(params, conv_paths: Sequence[str]) -> Dict[str, Dict[str, jax.Array]]:
    """Per-output-channel symmetric int8 quantization of the listed conv kernels.

    Returns ``{path: {"kernel_q": int8 HWIO, "w_scale": f32 (out,)}}``; computed under
    one jit to avoid eager dispatch.
    """

    def quantize_kernel(kernel):
        kernel = kernel.astype(jnp.float32)
        w_absmax = jnp.max(jnp.abs(kernel), axis=tuple(range(kernel.ndim - 1)))
        w_scale = jnp.maximum(w_absmax, 1e-12) / QINT_MAX
        kernel_q = jnp.clip(jnp.round(kernel / w_scale), -QINT_MAX, QINT_MAX).astype(jnp.int8)
        return {"kernel_q": kernel_q, "w_scale": w_scale}

    flat = {}
    for path in conv_paths:
        node = params
        for part in path.split("/"):
            node = node[part]
        flat[path] = node["kernel"]
    return jax.jit(lambda t: {p: quantize_kernel(k) for p, k in t.items()})(flat)


def discover_convs(module, variables, input_shape, **apply_kwargs) -> Dict[str, Tuple]:
    """Traces one abstract forward, returning ``{path: (kernel_shape,)}`` for every
    quantizable conv call (no device compute — ``jax.eval_shape``)."""
    found: Dict[str, Tuple] = {}

    def spot(next_fn, args, kwargs, context):
        m = context.module
        if _is_quantizable_conv(m, context.method_name):
            kernel = m.get_variable("params", "kernel")
            if kernel is not None:
                found[_path_key(m.path)] = tuple(kernel.shape)
        return next_fn(*args, **kwargs)

    def fwd(v, x):
        with nn.intercept_methods(spot):
            return module.apply(v, x, **apply_kwargs)

    jax.eval_shape(fwd, variables, jax.ShapeDtypeStruct(tuple(input_shape), jnp.float32))
    return found


# ---------------------------------------------------------------------------
# quantized forward
# ---------------------------------------------------------------------------
def _quantized_conv(m: nn.Conv, x: jax.Array, qrec: Dict[str, jax.Array], act_scale) -> jax.Array:
    """int8 x int8 -> int32 conv with float requantize, matching nn.Conv semantics."""
    kernel_q, w_scale = qrec["kernel_q"], qrec["w_scale"]
    n_spatial = kernel_q.ndim - 2
    strides, padding, kernel_dilation, groups = _conv_geometry(m, n_spatial)

    out_dtype = m.dtype or x.dtype
    xf = x.astype(jnp.float32)
    if act_scale is None:  # dynamic per-tensor scale: one extra reduction
        s_x = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-12) / QINT_MAX
    else:
        # clamp like the dynamic path: an all-zero calibration input (dead
        # channel block) would otherwise make s_x=0 and x/s_x = inf/NaN
        s_x = jnp.maximum(jnp.float32(act_scale), 1e-12) / QINT_MAX
    x_q = jnp.clip(jnp.round(xf / s_x), -QINT_MAX, QINT_MAX).astype(jnp.int8)

    dn = lax.conv_dimension_numbers(x_q.shape, kernel_q.shape, ("NHWC", "HWIO", "NHWC"))
    acc = lax.conv_general_dilated(
        x_q,
        kernel_q,
        strides,
        padding,
        rhs_dilation=kernel_dilation,
        dimension_numbers=dn,
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (s_x * w_scale)
    bias = m.get_variable("params", "bias") if m.use_bias else None
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


class QuantizedModel:
    """Callable int8-inference bundle over an existing module + variables.

    Built by :func:`quantize_model`; usable exactly like ``Model`` for eval forwards
    (``qmodel(x)``). ``module``/``variables``/``qparams``/``act_scales`` expose the
    functional pieces for custom jit. Reassigning any of them invalidates the cached
    jitted forward (qparams are baked into the executable as constants, so the cache
    must be rebuilt to observe new values).
    """

    def __init__(self, module, variables, qparams, act_scales: Optional[Dict[str, float]]):
        self.module = module
        self._variables = variables
        self._qparams = qparams
        self._act_scales = act_scales
        self._eval_fn = None

    # qparams/act_scales are jit constants and variables feed the cached fn:
    # reassignment must drop the stale executable (ADVICE r2)
    @property
    def variables(self):
        return self._variables

    @variables.setter
    def variables(self, value):
        self._variables = value
        self._eval_fn = None

    @property
    def qparams(self):
        return self._qparams

    @qparams.setter
    def qparams(self, value):
        self._qparams = value
        self._eval_fn = None

    @property
    def act_scales(self):
        return self._act_scales

    @act_scales.setter
    def act_scales(self, value):
        self._act_scales = value
        self._eval_fn = None

    def apply_fn(self):
        """Returns a pure ``(variables, qparams, x) -> logits`` quantized forward."""
        module, act_scales = self.module, self.act_scales

        def fwd(variables, qparams, x):
            def interceptor(next_fn, args, kwargs, context):
                m = context.module
                if _is_quantizable_conv(m, context.method_name):
                    key = _path_key(m.path)
                    if key in qparams:
                        scale = None if act_scales is None else act_scales.get(key)
                        return _quantized_conv(m, args[0], qparams[key], scale)
                return next_fn(*args, **kwargs)

            with nn.intercept_methods(interceptor):
                return module.apply(variables, x, train=False)

        return fwd

    def __call__(self, x: jax.Array):
        if self._eval_fn is None:
            fwd, qparams = self.apply_fn(), self.qparams
            # qparams closed over as jit constants: XLA bakes the int8 weights and
            # scales into the executable — measured ~20% faster than passing them
            # as runtime arguments (bench.py protocol, RepVGG-A0 batch 128/256)
            self._eval_fn = jax.jit(lambda v, a: fwd(v, qparams, a))
        return self._eval_fn(self.variables, x)

    def deploy_forward(self) -> "jax.stages.Wrapped":
        """Returns a quantized eval forward with variables AND qparams baked into
        the jit as compile-time constants — the full const-weights deploy protocol
        (same trade-offs as :meth:`Model.deploy_forward`: snapshot semantics, a
        second weight copy in HBM, ~400 MB HLO cap on remote-compile setups).

        ``__call__`` only bakes the qparams; the float remainder (BN-folded biases,
        unquantized convs, head) still travels as runtime arguments. Serving paths
        that want the measured const win should use this.
        """
        fwd, variables, qparams = self.apply_fn(), self.variables, self.qparams
        return jax.jit(lambda x: fwd(variables, qparams, x))


def quantize_model(
    model,
    calibration_batches: Optional[Iterable[jax.Array]] = None,
    input_shape: Optional[Tuple[int, ...]] = None,
    min_in_channels: int = 64,
) -> QuantizedModel:
    """Post-training-quantizes a :class:`~holocron_tpu.models.core.Model` for int8
    inference.

    Quantization is **selective, by measurement** (docs/PERF.md "int8" table): int8
    convs beat bf16 ~2x only where the MXU contraction is filled — at RepVGG shapes,
    192+ input channels wins 1.9-2.0x, 96 is parity, 48 is a slight loss and the
    3-channel stem a 1.7x loss. Convs whose per-group input-channel count is below
    ``min_in_channels`` therefore stay in bf16 (this also excludes depthwise convs,
    which never touch the MXU).

    Args:
        model: an initialized ``Model`` (reparametrize first where supported — BN
            folding before quantization is standard PTQ practice).
        calibration_batches: sample inputs for static activation scales; when omitted,
            scales are computed dynamically per forward (one extra reduction per conv).
        input_shape: NHWC shape used to trace conv discovery (defaults to the shape
            the model was initialized with).
        min_in_channels: skip convs with fewer per-group input channels than this.

    Returns:
        a :class:`QuantizedModel`.
    """
    if model.variables is None:
        raise RuntimeError("initialize the model first (run a forward or .init())")
    shape = tuple(input_shape or model._input_shape)
    convs = discover_convs(model.module, model.variables, shape)
    # kernel is HWIO with I = in_channels / groups: the MXU contraction depth per group
    convs = {p: s for p, s in convs.items() if s[-2] >= min_in_channels}
    qparams = quantize_conv_params(model.variables["params"], list(convs))
    act_scales = None
    if calibration_batches is not None:
        act_scales = calibrate(model.module, model.variables, calibration_batches)
    return QuantizedModel(model.module, model.variables, qparams, act_scales)
