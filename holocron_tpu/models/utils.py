"""Shared model plumbing: the conv->norm->act->blurpool->attention->drop block builder,
conv/BN fusion math, checkpoint factories, and pretrained-weight loading.

Reference: holocron/models/utils.py.
"""

import json
import logging
from pathlib import Path
from typing import Any, Callable, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.modules.conv import _MaskedDenseGroupConv, masked_dense_groups_wins
from ..nn.modules.downsample import BlurPool2d
from ..nn.init import kaiming_normal
from .checkpoints import (
    Checkpoint,
    Dataset,
    Evaluation,
    LoadingMeta,
    Metric,
    PreProcessing,
    TrainingRecipe,
)
from .core import Model
from .layers import BatchNorm2d, apply_layer
from .presets import IMAGENET, IMAGENETTE

__all__ = [
    "ConvSequence",
    "conv_sequence",
    "fold_s2d_kernel",
    "fuse_conv_bn",
    "load_pretrained_params",
    "model_from_hf_hub",
]

logger = logging.getLogger(__name__)


class ConvSequence(nn.Module):
    """THE block builder: conv -> norm -> act -> (blurpool if stride > 1) -> attention
    -> drop, with bias auto-disabled under normalization and the conv stride moved into
    the BlurPool when ``blurpool`` is set.

    Mirrors ``conv_sequence`` (holocron/models/utils.py:28-86) as a single NHWC module.

    Layer factories:
        act_layer: plain function ``x -> x`` or a module-factory ``() -> nn.Module``
        norm_layer: ``(channels) -> nn.Module`` (default when True: :class:`BatchNorm2d`)
        drop_layer: ``() -> nn.Module``
        attention_layer: ``(channels) -> nn.Module``
        conv_layer: ``(out_channels, kernel_size, **kw) -> nn.Module`` replacing nn.Conv
    """

    out_channels: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: int = 1
    padding: Union[int, str, Tuple[int, int]] = 0
    dilation: int = 1
    groups: int = 1
    bias: Optional[bool] = None
    act_layer: Optional[Callable] = None
    norm_layer: Optional[Union[bool, Callable]] = None
    drop_layer: Optional[Callable] = None
    conv_layer: Optional[Callable] = None
    bn_channels: Optional[int] = None
    attention_layer: Optional[Callable] = None
    blurpool: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        norm_factory = self.norm_layer
        if norm_factory is True:
            norm_factory = lambda c, name=None: BatchNorm2d(dtype=self.dtype, name=name)  # noqa: E731
        use_bias = self.bias if self.bias is not None else norm_factory is None

        conv_stride = self.stride
        stride = 1 if (self.blurpool and conv_stride > 1) else conv_stride
        ksize = self.kernel_size if isinstance(self.kernel_size, tuple) else (self.kernel_size, self.kernel_size)

        if self.conv_layer is not None:
            # contract: factory(out_channels, kernel_size, *, stride, padding, dilation,
            # groups, use_bias, dtype, name) -> module
            x = self.conv_layer(
                self.out_channels,
                self.kernel_size,
                stride=stride,
                padding=self.padding,
                dilation=self.dilation,
                groups=self.groups,
                use_bias=use_bias,
                dtype=self.dtype,
                name="conv",
            )(x)
        elif self.groups > 1 and masked_dense_groups_wins(x.shape[0], x.shape[-1] // self.groups):
            # grouped convs with narrow per-group contractions hit XLA's small-batch
            # grouped-emitter cliff (measured 21x on batch-1 resnext50_32x4d); run
            # them as a block-diagonal dense MXU conv — identical parameters/layout,
            # equality + crossover measurements in docs/PERF.md
            x = _MaskedDenseGroupConv(
                self.out_channels,
                ksize,
                groups=self.groups,
                strides=(stride, stride),
                padding=self.padding,
                kernel_dilation=(self.dilation, self.dilation),
                use_bias=use_bias,
                kernel_init=kaiming_normal(),
                dtype=self.dtype,
                name="conv",
            )(x)
        else:
            x = nn.Conv(
                self.out_channels,
                ksize,
                strides=(stride, stride),
                padding=self.padding,
                kernel_dilation=(self.dilation, self.dilation),
                feature_group_count=self.groups,
                use_bias=use_bias,
                kernel_init=kaiming_normal(),
                dtype=self.dtype,
                name="conv",
            )(x)
        def make(factory, *args, name):
            # deterministic child names keep the variable tree stable for checkpoints;
            # factories that accept a ``name`` kwarg get it, others keep auto-names
            try:
                return factory(*args, name=name)
            except TypeError:
                return factory(*args)

        if norm_factory is not None:
            x = apply_layer(make(norm_factory, self.bn_channels or self.out_channels, name="bn"), x, train)
        if self.act_layer is not None:
            act = make(self.act_layer, name="act") if isinstance(self.act_layer, type) else self.act_layer
            x = apply_layer(act, x, train)
        if self.blurpool and conv_stride > 1:
            x = BlurPool2d(stride=conv_stride, name="blurpool")(x)
        if self.attention_layer is not None:
            x = apply_layer(
                make(self.attention_layer, self.bn_channels or self.out_channels, name="attention"), x, train
            )
        if self.drop_layer is not None:
            x = apply_layer(make(self.drop_layer, name="drop"), x, train)
        return x


def conv_sequence(out_channels: int, **kwargs: Any) -> ConvSequence:
    """Factory alias keeping the reference's name (holocron/models/utils.py:28)."""
    return ConvSequence(out_channels=out_channels, **kwargs)


def fuse_conv_bn(
    kernel: jax.Array,
    bn_scale: jax.Array,
    bn_bias: jax.Array,
    bn_mean: jax.Array,
    bn_var: jax.Array,
    conv_bias: Optional[jax.Array] = None,
    eps: float = 1e-5,
) -> Tuple[jax.Array, jax.Array]:
    """Algebraic conv+BN fusion — the core of RepVGG/MobileOne reparametrization.

    Args:
        kernel: HWIO conv kernel ``(kh, kw, in_c, out_c)``
        bn_scale, bn_bias, bn_mean, bn_var: BN parameters/stats, each ``(out_c,)``

    Returns:
        ``(fused_kernel, fused_bias)``. Reference: holocron/models/utils.py:116-143.
    """
    if bn_bias.shape[0] != kernel.shape[-1]:
        raise AssertionError("expected same number of output channels for both `conv` and `bn`")
    scale_factor = bn_scale / jnp.sqrt(bn_var + eps)
    fused_bias = bn_bias - scale_factor * bn_mean
    if conv_bias is not None:
        logger.warning("convolution layers placed before batch normalization should not have a bias.")
        fused_bias = fused_bias + scale_factor * conv_bias
    fused_kernel = kernel * scale_factor  # broadcast over the trailing out_c axis
    return fused_kernel, fused_bias


def fold_s2d_kernel(k3: jax.Array) -> jax.Array:
    """Folds a ``(3, 3, C, O)`` stride-2 pad-1 kernel into the equivalent
    ``(2, 2, 4C, O)`` stride-1 kernel over the space-to-depth(2) input.

    Derivation: with pad-1, output pixel ``(i, j)`` reads ``x[2i+d-1]`` for
    ``d in {0, 1, 2}``. Writing ``2i+d-1 = 2(i-1+u)+a`` gives ``(u, a) = (0, 1)``
    for ``d=0`` and ``(1, d-1)`` otherwise — a 2x2 window over
    ``z[p, q, (a, b, c)] = x[2p+a, 2q+b, c]``
    (:func:`~holocron_tpu.nn.functional.concat_downsample2d` channel order) with
    one zero row/col padded on top/left (``padding=((1, 0), (1, 0))``). The unused
    ``(u=0, a=0)`` taps stay zero, so the rewrite is exact — bit-exact for integer
    kernels (the int8 strided-conv fast path in :mod:`holocron_tpu.quant` relies
    on this).

    Used by RepVGG's opt-in ``reparametrize(s2d_stem=True)`` form and by the int8
    deploy path, where XLA's stride-2 int8 convolutions measure 4-12x below their
    stride-1 peers per FLOP (docs/PERF.md round-4 int8 trace).
    """
    _, _, c, o = k3.shape
    k2 = jnp.zeros((2, 2, 4 * c, o), k3.dtype)
    for di in range(3):
        u, a = (0, 1) if di == 0 else (1, di - 1)
        for dj in range(3):
            v, b = (0, 1) if dj == 0 else (1, dj - 1)
            ch = (a * 2 + b) * c
            k2 = k2.at[u, v, ch : ch + c].set(k3[di, dj])
    return k2


def _download_checkpoint(url: str, sha256: Optional[str] = None, progress: bool = True) -> Path:
    """Downloads ``url`` into the local checkpoint cache (torch-free analog of
    ``torch.hub.load_state_dict_from_url``), verifying ``sha256`` when given.

    Cache dir: ``$HOLOCRON_CACHE_DIR`` or ``~/.cache/holocron_tpu/checkpoints``.
    """
    import hashlib
    import os
    import tempfile
    import urllib.parse
    import urllib.request

    cache_dir = Path(
        os.environ.get("HOLOCRON_CACHE_DIR", Path.home() / ".cache" / "holocron_tpu")
    ) / "checkpoints"
    cache_dir.mkdir(parents=True, exist_ok=True)
    # Key the cache entry on the FULL url, not just the basename: two releases can both
    # ship a `model.pth`, and without a sha256 to catch it the second request would
    # silently serve the first file's bytes (also covers paths ending in "/").
    url_key = hashlib.sha256(url.encode()).hexdigest()[:16]
    basename = Path(urllib.parse.urlparse(url).path).name or "checkpoint.pth"
    dest = cache_dir / f"{url_key}-{basename}"
    if not dest.exists():
        if progress:
            logger.info(f"Downloading {url} to {dest}")
        fd, tmp = tempfile.mkstemp(dir=cache_dir)
        try:
            with urllib.request.urlopen(url) as r, os.fdopen(fd, "wb") as f:
                while chunk := r.read(1 << 20):
                    f.write(chunk)
            os.replace(tmp, dest)
        except BaseException:
            Path(tmp).unlink(missing_ok=True)
            raise
    if sha256:
        digest = hashlib.sha256(dest.read_bytes()).hexdigest()
        if digest != sha256:
            dest.unlink()
            raise ValueError(f"checkpoint hash mismatch for {url}: {digest} != {sha256}")
    return dest


def load_pretrained_params(
    model: Model,
    url: Optional[str] = None,
    progress: bool = True,
    key_replacement: Optional[Tuple[str, str]] = None,
    key_filter: Optional[str] = None,
    sha256: Optional[str] = None,
) -> None:
    """Loads a released torch checkpoint into a :class:`Model`, converting the state
    dict to the NHWC/Flax variable tree.

    Fully torch-free: the ``.pth`` bytes are parsed by :mod:`._pth_reader` (zip or
    legacy ``torch.save`` format), so ``pretrained=True`` works with this package's
    own dependency set. Reference: holocron/models/utils.py:89-113. In offline
    environments the download failure degrades to default initialization with a
    warning (the same behavior the reference has for a ``None`` url).
    """
    model.pretrained_loaded = False
    if url is None:
        logger.warning("Invalid model URL, using default initialization.")
        return
    try:
        from ._pth_reader import read_pth

        path = _download_checkpoint(url, sha256=sha256, progress=progress)
        state_dict = read_pth(path)
    except Exception as e:  # zero-egress environments
        logger.warning(f"Could not download checkpoint from {url} ({e}), using default initialization.")
        return
    if isinstance(state_dict, dict) and "model" in state_dict and not any("." in k for k in state_dict):
        state_dict = state_dict["model"]  # trainer checkpoint not stripped by clean_checkpoint.py
    if isinstance(key_filter, str):
        state_dict = {k: v for k, v in state_dict.items() if k.startswith(key_filter)}
    if isinstance(key_replacement, tuple):
        state_dict = {k.replace(*key_replacement): v for k, v in state_dict.items()}
    from ._torch_convert import convert_state_dict, merge_variables

    variables = convert_state_dict(model, state_dict)
    if variables.pop("__partial__", False):
        # partial (e.g. backbone-only) checkpoints graft onto the initialized tree
        if model.variables is None:
            shape = getattr(model.default_cfg, "pre_processing", None)
            model.init((1, 64, 64, 3) if shape is None else (1, *shape.input_shape))
        variables = merge_variables(model.variables, variables)
    model.load_variables(variables)
    model.pretrained_loaded = True


def model_from_hf_hub(repo_id: str, **kwargs: Any) -> Model:
    """Instantiates & loads a pretrained model from the HuggingFace hub.

    Reference: holocron/models/utils.py:146-175.
    """
    from huggingface_hub import hf_hub_download

    from . import classification

    with Path(hf_hub_download(repo_id, filename="config.json", **kwargs)).open("rb") as f:
        cfg = json.load(f)

    model = classification.__dict__[cfg["arch"]](num_classes=len(cfg["classes"]), pretrained=False)
    if model.default_cfg is None:
        model.default_cfg = _checkpoint_from_hub_config(cfg)

    from ._pth_reader import read_pth

    state_dict = read_pth(hf_hub_download(repo_id, filename="pytorch_model.bin", **kwargs))
    from ._torch_convert import convert_state_dict

    model.load_variables(convert_state_dict(model, state_dict))
    return model


def _configure_model(model: Model, checkpoint: Optional[Checkpoint], progress: bool = True) -> Model:
    """Attaches ``default_cfg`` and loads pretrained params
    (holocron/models/utils.py:178-188)."""
    model.default_cfg = checkpoint
    if isinstance(checkpoint, Checkpoint):
        sha = checkpoint.meta.sha256
        load_pretrained_params(
            model,
            checkpoint.meta.url,
            progress=progress,
            sha256=sha if isinstance(sha, str) and len(sha) == 64 else None,
        )
    return model


def _checkpoint_from_hub_config(hub_config: dict) -> Checkpoint:
    return Checkpoint(
        evaluation=Evaluation(dataset=Dataset.IMAGENETTE, results={}),
        meta=LoadingMeta(
            url="N/A",
            sha256="N/A",
            size=0,
            num_params=0,
            arch=hub_config["arch"],
            categories=hub_config["classes"],
        ),
        pre_processing=PreProcessing(
            input_shape=tuple(hub_config["input_shape"]), mean=hub_config["mean"], std=hub_config["std"]
        ),
        recipe=TrainingRecipe(commit=None, script="references/classification/train.py", args=None),
    )


def _checkpoint(
    arch: str,
    url: str,
    acc1: float,
    acc5: float,
    sha256: str,
    size: int,
    num_params: int,
    commit: Optional[str] = None,
    train_args: Optional[str] = None,
    dataset: Dataset = Dataset.IMAGENETTE,
) -> Checkpoint:
    """Builds a Checkpoint entry (holocron/models/utils.py:207-230); ``input_shape`` is
    channel-last."""
    preset = IMAGENETTE if dataset == Dataset.IMAGENETTE else IMAGENET
    return Checkpoint(
        evaluation=Evaluation(dataset=dataset, results={Metric.TOP1_ACC: acc1, Metric.TOP5_ACC: acc5}),
        meta=LoadingMeta(
            url=url, sha256=sha256, size=size, num_params=num_params, arch=arch, categories=preset.classes
        ),
        pre_processing=PreProcessing(input_shape=(224, 224, 3), mean=preset.mean, std=preset.std),
        recipe=TrainingRecipe(commit=commit, script="references/classification/train.py", args=train_args),
    )
