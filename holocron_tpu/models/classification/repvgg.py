"""RepVGG (`Ding et al. <https://arxiv.org/pdf/2101.03697.pdf>`_) — TPU-native rebuild.

Reference: holocron/models/classification/repvgg.py. Train form: per-block sum of a
3x3-conv+BN branch, a 1x1-conv+BN branch and (for stride-1 same-width blocks) an
identity BN branch. ``reparametrize`` folds every block into a single biased 3x3 conv —
pure pytree math here (fuse_conv_bn + center-padding the 1x1 + diagonal identity), no
module surgery, and the deploy net is a straight conv stack that XLA maps 1:1 onto the
MXU.
"""

from enum import Enum
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...nn.init import kaiming_normal
from ..checkpoints import Checkpoint, _handle_legacy_pretrained
from ..core import Model
from ..layers import BatchNorm2d
from ..utils import _checkpoint, _configure_model, fuse_conv_bn

__all__ = [
    "RepBlock",
    "RepVGG",
    "RepVGG_A0_Checkpoint",
    "RepVGG_A1_Checkpoint",
    "RepVGG_A2_Checkpoint",
    "RepVGG_B0_Checkpoint",
    "RepVGG_B1_Checkpoint",
    "RepVGG_B2_Checkpoint",
    "repvgg_a0",
    "repvgg_a1",
    "repvgg_a2",
    "repvgg_b0",
    "repvgg_b1",
    "repvgg_b2",
    "repvgg_b3",
]


class RepBlock(nn.Module):
    """One RepVGG block (reference: repvgg.py:38-107).

    ``s2d`` (deploy-only): run the block as a 2x2 stride-1 conv over the
    space-to-depth(2) rearrangement of the input — mathematically identical to the
    3x3 stride-2 form (see :func:`_fold_s2d_stem_kernel`) but with 4x the input
    channels, which packs the MXU far better for the 3-channel stem.

    ``s2d_input`` (requires ``s2d``): the input is ALREADY space-to-depth
    rearranged (``(N, H/2, W/2, 4C)``, :func:`concat_downsample2d` channel order)
    by the host pipeline, so the device never pays the rearrange's HBM round trip
    (the MLPerf-style TPU input optimization).
    """

    planes: int
    stride: int = 1
    identity: bool = True
    act_layer: Callable = jax.nn.relu
    deploy: bool = False
    dtype: Optional[Any] = None
    s2d: bool = False
    s2d_input: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.identity and x.shape[-1] != self.planes:
            raise ValueError("The number of input and output channels must be identical if identity is used")
        if self.deploy:
            if self.s2d:
                if self.s2d_input:
                    if x.shape[-1] % 4:
                        raise ValueError("s2d_input expects a space-to-depth(2) batch (channels % 4 == 0)")
                    z = x
                else:
                    if self.stride != 2 or x.shape[1] % 2 or x.shape[2] % 2:
                        raise ValueError("s2d deploy form requires stride 2 and even input H/W")
                    from ...nn.functional import concat_downsample2d

                    z = concat_downsample2d(x, 2)
                # top/left zero column in z-space stands in for the original pad-1
                # row/col of x; the (u=0, a=0) kernel entries are zero by the fold
                out = nn.Conv(
                    self.planes,
                    (2, 2),
                    strides=(1, 1),
                    padding=((1, 0), (1, 0)),
                    use_bias=True,
                    kernel_init=kaiming_normal(),
                    dtype=self.dtype,
                    name="rep_conv",
                )(z)
            else:
                out = nn.Conv(
                    self.planes,
                    (3, 3),
                    strides=(self.stride, self.stride),
                    padding=1,
                    use_bias=True,
                    kernel_init=kaiming_normal(),
                    dtype=self.dtype,
                    name="rep_conv",
                )(x)
        else:
            conv_kw = {"use_bias": False, "kernel_init": kaiming_normal(), "dtype": self.dtype}
            b3 = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride), padding=1, name="conv_3x3", **conv_kw)(x)
            b3 = BatchNorm2d(dtype=self.dtype, name="bn_3x3")(b3, train)
            b1 = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride), padding=0, name="conv_1x1", **conv_kw)(x)
            b1 = BatchNorm2d(dtype=self.dtype, name="bn_1x1")(b1, train)
            out = b3 + b1
            if self.identity:
                out = out + BatchNorm2d(dtype=self.dtype, name="bn_id")(x, train)
        return self.act_layer(out)


def _fuse_rep_block(block_params: dict, block_stats: dict, eps: float = 1e-5) -> dict:
    """Fuses a RepBlock's branches into one biased 3x3 kernel (repvgg.py:75-107)."""
    k3, b3 = fuse_conv_bn(
        block_params["conv_3x3"]["kernel"],
        block_params["bn_3x3"]["scale"],
        block_params["bn_3x3"]["bias"],
        block_stats["bn_3x3"]["mean"],
        block_stats["bn_3x3"]["var"],
        eps=eps,
    )
    k1, b1 = fuse_conv_bn(
        block_params["conv_1x1"]["kernel"],
        block_params["bn_1x1"]["scale"],
        block_params["bn_1x1"]["bias"],
        block_stats["bn_1x1"]["mean"],
        block_stats["bn_1x1"]["var"],
        eps=eps,
    )
    kernel = k3.at[1:2, 1:2].add(k1)
    bias = b3 + b1
    if "bn_id" in block_params:
        bn = block_params["bn_id"]
        stats = block_stats["bn_id"]
        scale_factor = bn["scale"] / jnp.sqrt(stats["var"] + eps)
        in_c, out_c = kernel.shape[2], kernel.shape[3]
        diag = jnp.zeros((in_c, out_c), kernel.dtype).at[jnp.arange(in_c), jnp.arange(out_c)].set(scale_factor)
        kernel = kernel.at[1, 1].add(diag)
        bias = bias + bn["bias"] - scale_factor * stats["mean"]
    return {"rep_conv": {"kernel": kernel, "bias": bias}}


def _fold_s2d_stem_kernel(k3: jax.Array) -> jax.Array:
    """Stem-fold alias of :func:`~holocron_tpu.models.utils.fold_s2d_kernel` (the
    algebra moved there in round 4 so the int8 strided-conv fast path can share it)."""
    from ..utils import fold_s2d_kernel

    return fold_s2d_kernel(k3)


class RepVGG(nn.Module):
    """RepVGG body: staged RepBlocks -> global average pool -> linear head.

    Reference: repvgg.py:110-171. Stage ``s`` opens with a stride-2 non-identity block
    followed by ``num_blocks[s]`` stride-1 identity blocks (the reference's layout).

    ``s2d_stem`` (deploy form only): replace the 3-input-channel stem conv with its
    space-to-depth fold — same math, better MXU packing (docs/PERF.md).
    ``s2d_input`` (requires ``s2d_stem``): expect the input batch ALREADY
    space-to-depth rearranged by the host pipeline (``(N, H/2, W/2, 12)``).
    """

    num_blocks: Sequence[int]
    planes: Sequence[int]
    width_multiplier: float
    final_width_multiplier: float
    num_classes: int = 10
    in_channels: int = 3
    act_layer: Callable = jax.nn.relu
    deploy: bool = False
    dtype: Optional[Any] = None
    s2d_stem: bool = False
    s2d_input: bool = False

    def _stage_channels(self) -> list:
        if len(self.num_blocks) != len(self.planes):
            raise AssertionError("the length of `num_blocks` and `planes` are expected to be the same")
        chans = [int(min(1, self.width_multiplier) * self.planes[0])]
        chans.extend(int(self.width_multiplier * chan) for chan in self.planes[1:-1])
        chans.append(int(self.final_width_multiplier * self.planes[-1]))
        return chans

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        chans = self._stage_channels()
        for s, (nb, out_c) in enumerate(zip(self.num_blocks, chans)):
            s2d = self.s2d_stem and s == 0
            s2d_in = self.s2d_input and s == 0
            x = RepBlock(
                out_c, 2, False, self.act_layer, self.deploy, self.dtype, s2d, s2d_in, name=f"features_{s}_0"
            )(x, train)
            for j in range(nb):
                x = RepBlock(out_c, 1, True, self.act_layer, self.deploy, self.dtype, name=f"features_{s}_{j + 1}")(
                    x, train
                )
        x = jnp.mean(x, axis=(1, 2))  # GlobalAvgPool2d(flatten=True)
        x = nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)
        return x

    def reparametrize(
        self, variables: dict, s2d_stem: bool = False, s2d_input: bool = False
    ) -> Tuple["RepVGG", dict]:
        """Returns the deploy module and its fused variables (repvgg.py:166-171).

        ``s2d_stem=True`` additionally folds the stem into its space-to-depth form
        (:func:`_fold_s2d_stem_kernel`) — numerically identical, faster on the MXU.
        ``s2d_input=True`` (implies ``s2d_stem``) makes the deploy module consume a
        host-rearranged ``(N, H/2, W/2, 12)`` batch, skipping the on-device
        rearrange entirely (see :func:`space_to_depth_batch`).
        """
        s2d_stem = s2d_stem or s2d_input
        if self.deploy:
            # already fused — the reference raises AssertionError too (repvgg.py:79-80)
            raise AssertionError("model is already reparametrized")

        def fuse(variables: dict) -> dict:
            params = variables["params"]
            stats = variables.get("batch_stats", {})
            new_params = {}
            for name, block_params in params.items():
                if name.startswith("features_"):
                    new_params[name] = _fuse_rep_block(block_params, stats[name])
                else:
                    new_params[name] = block_params
            if s2d_stem:
                stem = new_params["features_0_0"]["rep_conv"]
                new_params["features_0_0"]["rep_conv"] = {
                    "kernel": _fold_s2d_stem_kernel(stem["kernel"]),
                    "bias": stem["bias"],
                }
            return {"params": new_params}

        deploy_module = self.clone(deploy=True, s2d_stem=s2d_stem, s2d_input=s2d_input)
        return deploy_module, jax.jit(fuse)(variables)


def _repvgg(
    checkpoint: Optional[Checkpoint],
    progress: bool,
    num_blocks: Sequence[int],
    a: float,
    b: float,
    **kwargs: Any,
) -> Model:
    module = RepVGG(num_blocks, [64, 64, 128, 256, 512], a, b, **kwargs)
    return _configure_model(Model(module), checkpoint, progress=progress)


class RepVGG_A0_Checkpoint(Enum):
    IMAGENETTE = _checkpoint(
        arch="repvgg_a0",
        url="https://github.com/frgfm/Holocron/releases/download/v0.2.1/repvgg_a0_224-d3f54b28.pth",
        acc1=0.9292,
        acc5=0.9946,
        sha256="d3f54b28567fcd7e3e32ffbcffb5bb5c64fd97b7139cba0bfe9ad0bd7765cdaa",
        size=99183419,
        num_params=24741642,
        commit="d4a59999179b42fc0d3058ac6b76cc41f49dd56e",
        train_args=(
            "./imagenette2-320/ --arch repvgg_a0 --batch-size 64 --mixup-alpha 0.2 --amp --device 0 --epochs 100"
            " --lr 1e-3 --label-smoothing 0.1 --random-erase 0.1 --train-crop-size 176 --val-resize-size 232"
            " --opt adamw --weight-decay 5e-2"
        ),
    )
    DEFAULT = IMAGENETTE


class RepVGG_A1_Checkpoint(Enum):
    IMAGENETTE = _checkpoint(
        arch="repvgg_a1",
        url="https://github.com/frgfm/Holocron/releases/download/v0.2.1/repvgg_a1_224-8d3269fb.pth",
        acc1=0.9378,
        acc5=0.9918,
        sha256="8d3269fb5181c0fe75ef617872238135f3002f41e82e5ef7492d62a402ffae50",
        size=120724868,
        num_params=30119946,
        commit="d4a59999179b42fc0d3058ac6b76cc41f49dd56e",
        train_args=(
            "./imagenette2-320/ --arch repvgg_a1 --batch-size 64 --mixup-alpha 0.2 --amp --device 0 --epochs 100"
            " --lr 1e-3 --label-smoothing 0.1 --random-erase 0.1 --train-crop-size 176 --val-resize-size 232"
            " --opt adamw --weight-decay 5e-2"
        ),
    )
    DEFAULT = IMAGENETTE


class RepVGG_A2_Checkpoint(Enum):
    IMAGENETTE = _checkpoint(
        arch="repvgg_a2",
        url="https://github.com/frgfm/Holocron/releases/download/v0.2.1/repvgg_a2_224-cb442207.pth",
        acc1=0.9363,
        acc5=0.9939,
        sha256="cb442207d0c4627e3a16d7a8b4bf5342a182fd924cf4a044ac3a832014e7d4cf",
        size=194822538,
        num_params=48629514,
        commit="d4a59999179b42fc0d3058ac6b76cc41f49dd56e",
        train_args=(
            "./imagenette2-320/ --arch repvgg_a2 --batch-size 64 --mixup-alpha 0.2 --amp --device 0 --epochs 100"
            " --lr 1e-3 --label-smoothing 0.1 --random-erase 0.1 --train-crop-size 176 --val-resize-size 232"
            " --opt adamw --weight-decay 5e-2"
        ),
    )
    DEFAULT = IMAGENETTE


class RepVGG_B0_Checkpoint(Enum):
    IMAGENETTE = _checkpoint(
        arch="repvgg_b0",
        url="https://github.com/frgfm/Holocron/releases/download/v0.2.1/repvgg_b0_224-fdcdd2b7.pth",
        acc1=0.9269,
        acc5=0.9921,
        sha256="fdcdd2b739f19b47572be5a98ec407c08935d02adf1ab0bf90d7bc92c710fe2d",
        size=127668600,
        num_params=31845642,
        commit="d4a59999179b42fc0d3058ac6b76cc41f49dd56e",
        train_args=(
            "./imagenette2-320/ --arch repvgg_b0 --batch-size 64 --mixup-alpha 0.2 --amp --device 0 --epochs 100"
            " --lr 1e-3 --label-smoothing 0.1 --random-erase 0.1 --train-crop-size 176 --val-resize-size 232"
            " --opt adamw --weight-decay 5e-2"
        ),
    )
    DEFAULT = IMAGENETTE


class RepVGG_B1_Checkpoint(Enum):
    IMAGENETTE = _checkpoint(
        arch="repvgg_b1",
        url="https://github.com/frgfm/Holocron/releases/download/v0.2.1/repvgg_b1_224-3e5b28d7.pth",
        acc1=0.9396,
        acc5=0.9939,
        sha256="3e5b28d7803965546efadeb20abb84d8fef765dd08170677467a9c06294224c4",
        size=403763795,
        num_params=100829194,
        commit="d4a59999179b42fc0d3058ac6b76cc41f49dd56e",
        train_args=(
            "./imagenette2-320/ --arch repvgg_b1 --batch-size 64 --mixup-alpha 0.2 --amp --device 0 --epochs 100"
            " --lr 1e-3 --label-smoothing 0.1 --random-erase 0.1 --train-crop-size 176 --val-resize-size 232"
            " --opt adamw --weight-decay 5e-2"
        ),
    )
    DEFAULT = IMAGENETTE


class RepVGG_B2_Checkpoint(Enum):
    IMAGENETTE = _checkpoint(
        arch="repvgg_b2",
        url="https://github.com/frgfm/Holocron/releases/download/v0.2.1/repvgg_b2_224-dc810d88.pth",
        acc1=0.9414,
        acc5=0.9957,
        sha256="dc810d889e8533f3ab24d75d8bf4cec84380abfb3b10ee01009997eab6a35d4b",
        size=630382163,
        num_params=157462410,
        commit="d4a59999179b42fc0d3058ac6b76cc41f49dd56e",
        train_args=(
            "./imagenette2-320/ --arch repvgg_b2 --batch-size 32 --grad-acc 2 --mixup-alpha 0.2 --amp --device 0"
            " --epochs 100 --lr 1e-3 --label-smoothing 0.1 --random-erase 0.1 --train-crop-size 176"
            " --val-resize-size 232 --opt adamw --weight-decay 5e-2"
        ),
    )
    DEFAULT = IMAGENETTE


def repvgg_a0(
    pretrained: bool = False,
    checkpoint: Optional[Checkpoint] = None,
    progress: bool = True,
    **kwargs: Any,
) -> Model:
    """RepVGG-A0 (reference: repvgg.py:206-233)."""
    checkpoint = _handle_legacy_pretrained(pretrained, checkpoint, RepVGG_A0_Checkpoint.DEFAULT.value)
    return _repvgg(checkpoint, progress, [1, 2, 4, 14, 1], 0.75, 2.5, **kwargs)


def repvgg_a1(
    pretrained: bool = False,
    checkpoint: Optional[Checkpoint] = None,
    progress: bool = True,
    **kwargs: Any,
) -> Model:
    """RepVGG-A1 (reference: repvgg.py:262-289)."""
    checkpoint = _handle_legacy_pretrained(pretrained, checkpoint, RepVGG_A1_Checkpoint.DEFAULT.value)
    return _repvgg(checkpoint, progress, [1, 2, 4, 14, 1], 1, 2.5, **kwargs)


def repvgg_a2(
    pretrained: bool = False,
    checkpoint: Optional[Checkpoint] = None,
    progress: bool = True,
    **kwargs: Any,
) -> Model:
    """RepVGG-A2 (reference: repvgg.py:318-345)."""
    checkpoint = _handle_legacy_pretrained(pretrained, checkpoint, RepVGG_A2_Checkpoint.DEFAULT.value)
    return _repvgg(checkpoint, progress, [1, 2, 4, 14, 1], 1.5, 2.75, **kwargs)


def repvgg_b0(
    pretrained: bool = False,
    checkpoint: Optional[Checkpoint] = None,
    progress: bool = True,
    **kwargs: Any,
) -> Model:
    """RepVGG-B0 (reference: repvgg.py:374-401)."""
    checkpoint = _handle_legacy_pretrained(pretrained, checkpoint, RepVGG_B0_Checkpoint.DEFAULT.value)
    return _repvgg(checkpoint, progress, [1, 4, 6, 16, 1], 1, 2.5, **kwargs)


def repvgg_b1(
    pretrained: bool = False,
    checkpoint: Optional[Checkpoint] = None,
    progress: bool = True,
    **kwargs: Any,
) -> Model:
    """RepVGG-B1 (reference: repvgg.py:430-457)."""
    checkpoint = _handle_legacy_pretrained(pretrained, checkpoint, RepVGG_B1_Checkpoint.DEFAULT.value)
    return _repvgg(checkpoint, progress, [1, 4, 6, 16, 1], 2, 4, **kwargs)


def repvgg_b2(
    pretrained: bool = False,
    checkpoint: Optional[Checkpoint] = None,
    progress: bool = True,
    **kwargs: Any,
) -> Model:
    """RepVGG-B2 (reference: repvgg.py:486-513)."""
    checkpoint = _handle_legacy_pretrained(pretrained, checkpoint, RepVGG_B2_Checkpoint.DEFAULT.value)
    return _repvgg(checkpoint, progress, [1, 4, 6, 16, 1], 2.5, 5, **kwargs)


def repvgg_b3(
    pretrained: bool = False,
    checkpoint: Optional[Checkpoint] = None,
    progress: bool = True,
    **kwargs: Any,
) -> Model:
    """RepVGG-B3 (reference: repvgg.py:542-566)."""
    checkpoint = _handle_legacy_pretrained(pretrained, checkpoint, None)
    return _repvgg(checkpoint, progress, [1, 4, 6, 16, 1], 3, 5, **kwargs)
