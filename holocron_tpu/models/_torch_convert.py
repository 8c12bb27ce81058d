"""Torch-checkpoint -> Flax-variables conversion.

The reference's released ``.pth`` checkpoints (holocron/models/checkpoints.py) are torch
state dicts in NCHW/OIHW layout. Each architecture registers a converter mapping those
keys onto the NHWC/HWIO variable tree used here. Conversion rules:

- conv kernels: ``(O, I, kh, kw) -> (kh, kw, I, O)`` (depthwise included)
- linear kernels: ``(O, I) -> (I, O)``
- batch norm: ``weight/bias/running_mean/running_var -> scale/bias + batch_stats``
"""

from typing import Any, Callable, Dict

import jax.numpy as jnp
import numpy as np

__all__ = ["convert_state_dict", "register_converter"]

_CONVERTERS: Dict[str, Callable] = {}


def register_converter(module_cls_name: str):
    def deco(fn):
        _CONVERTERS[module_cls_name] = fn
        return fn

    return deco


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def t2j_conv(w) -> jnp.ndarray:
    """OIHW -> HWIO (also handles depthwise (C,1,kh,kw) -> (kh,kw,1,C))."""
    return jnp.asarray(_np(w).transpose(2, 3, 1, 0))


def t2j_linear(w) -> jnp.ndarray:
    return jnp.asarray(_np(w).T)


def t2j_bn(state_dict, prefix: str):
    """Returns (params, stats) dicts for a torch BN at ``prefix``."""
    params = {
        "scale": jnp.asarray(_np(state_dict[f"{prefix}.weight"])),
        "bias": jnp.asarray(_np(state_dict[f"{prefix}.bias"])),
    }
    stats = {
        "mean": jnp.asarray(_np(state_dict[f"{prefix}.running_mean"])),
        "var": jnp.asarray(_np(state_dict[f"{prefix}.running_var"])),
    }
    return params, stats


def convert_state_dict(model, state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Converts a torch state dict into the variables tree for ``model.module``."""
    cls_name = type(model.module).__name__
    if cls_name not in _CONVERTERS:
        raise NotImplementedError(f"no torch-checkpoint converter registered for {cls_name}")
    return _CONVERTERS[cls_name](model.module, state_dict)


def _set(tree: Dict[str, Any], path: str, value) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _conv_at(state_dict, prefix: str, params, stats, dest: str) -> None:
    """Maps a torch conv(+optional bias) at ``prefix`` to ``dest/{kernel,bias}``."""
    _set(params, f"{dest}/kernel", t2j_conv(state_dict[f"{prefix}.weight"]))
    if f"{prefix}.bias" in state_dict:
        _set(params, f"{dest}/bias", jnp.asarray(_np(state_dict[f"{prefix}.bias"])))


def _bn_at(state_dict, prefix: str, params, stats, dest: str) -> None:
    p, s = t2j_bn(state_dict, prefix)
    _set(params, dest, p)
    _set(stats, dest, s)


def _dense_at(state_dict, prefix: str, params, dest: str) -> None:
    _set(params, f"{dest}/kernel", t2j_linear(state_dict[f"{prefix}.weight"]))
    if f"{prefix}.bias" in state_dict:
        _set(params, f"{dest}/bias", jnp.asarray(_np(state_dict[f"{prefix}.bias"])))


@register_converter("RepVGG")
def _convert_repvgg(module, state_dict):
    """Maps ``features.{s}.{j}.branches...`` / ``head.*`` keys
    (holocron/models/classification/repvgg.py:55-73,156-162)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for s, nb in enumerate(module.num_blocks):
        for j in range(nb + 1):
            t = f"features.{s}.{j}.branches"
            name = f"features_{s}_{j}"
            bp: Dict[str, Any] = {"conv_3x3": {"kernel": t2j_conv(state_dict[f"{t}.0.0.weight"])}}
            bs: Dict[str, Any] = {}
            bp["bn_3x3"], bs["bn_3x3"] = t2j_bn(state_dict, f"{t}.0.1")
            bp["conv_1x1"] = {"kernel": t2j_conv(state_dict[f"{t}.1.0.weight"])}
            bp["bn_1x1"], bs["bn_1x1"] = t2j_bn(state_dict, f"{t}.1.1")
            if f"{t}.2.weight" in state_dict:  # identity BN branch
                bp["bn_id"], bs["bn_id"] = t2j_bn(state_dict, f"{t}.2")
            params[name] = bp
            stats[name] = bs
    params["head"] = {
        "kernel": t2j_linear(state_dict["head.weight"]),
        "bias": jnp.asarray(_np(state_dict["head.bias"])),
    }
    return {"params": params, "batch_stats": stats}


@register_converter("ResNet")
def _convert_resnet(module, state_dict):
    """Maps the reference ResNet container's ``features.*`` Sequential indices
    (holocron/models/classification/resnet.py:224-373) onto stem_*/layer_i_j names.

    Supports BasicBlock/Bottleneck (incl. ResNeXt groups, deep stem, ResNet-D avg
    downsampling) plus the Bottle2neck/SKBottleneck/Tridentneck layouts via the block
    class name.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    block_name = module.block.__name__

    idx = 0
    num_stem = 3 if module.deep_stem else 1
    for s in range(num_stem):
        _conv_at(state_dict, f"features.{idx}", params, stats, f"stem_{s}/conv")
        _bn_at(state_dict, f"features.{idx + 1}", params, stats, f"stem_{s}/bn")
        idx += 3  # conv, bn, act
    if module.stem_pool:
        idx += 1
    if module.num_repeats > 1:
        idx += 1  # ChannelRepeat

    # per-block conv layout: list of (flax_name, has_scale_conv) conv_sequence offsets
    def convert_block(tprefix, dest, in_planes, planes):
        if block_name == "BasicBlock":
            layout = [("conv_0", 0), ("conv_1", 3)]
        elif block_name in ("Bottleneck", "Tridentneck"):
            layout = [("conv_0", 0), ("conv_1", 3), ("conv_2", 6)]
        elif block_name == "Bottle2neck":
            layout = [("conv_0", 0), ("conv_2", 4)]  # ScaleConv2d sits at conv index 3
        elif block_name == "SKBottleneck":
            layout = [("conv_0", 0), ("conv_2", 4)]  # SKConv2d at conv index 3
        elif block_name in ("PyBottleneck", "PyHGBottleneck"):
            layout = [("conv_0", 0), ("conv_2", 6)]  # PyConv2d pyramid at conv index 3
        else:
            raise NotImplementedError(f"unsupported block: {block_name}")
        for name, off in layout:
            _conv_at(state_dict, f"{tprefix}.conv.{off}", params, stats, f"{dest}/{name}/conv")
            _bn_at(state_dict, f"{tprefix}.conv.{off + 1}", params, stats, f"{dest}/{name}/bn")
        if block_name in ("PyBottleneck", "PyHGBottleneck"):
            # PyConv2d is a torch ModuleList of per-level convs (reference
            # nn/modules/conv.py:373-438) -> our level{k} children
            k = 0
            while f"{tprefix}.conv.3.{k}.weight" in state_dict:
                _conv_at(state_dict, f"{tprefix}.conv.3.{k}", params, stats, f"{dest}/conv_1/conv/level{k}")
                k += 1
            _bn_at(state_dict, f"{tprefix}.conv.4", params, stats, f"{dest}/conv_1/bn")
        if block_name == "Bottle2neck":
            # ScaleConv2d: conv list of [conv, bn, act] sequentials (res2net.py:42-58)
            scale = module.block_args.get("scale", 4) if isinstance(module.block_args, dict) else 4
            for k in range(max(1, scale - 1)):
                _conv_at(state_dict, f"{tprefix}.conv.3.conv.{k}.0", params, stats, f"{dest}/conv_1/conv_{k}/conv")
                _bn_at(state_dict, f"{tprefix}.conv.3.conv.{k}.1", params, stats, f"{dest}/conv_1/conv_{k}/bn")
        if block_name == "SKBottleneck":
            # SKConv2d: path_convs + SoftAttentionLayer (sknet.py:74-113)
            for k in range(2):
                _conv_at(state_dict, f"{tprefix}.conv.3.path_convs.{k}.0", params, stats, f"{dest}/conv_1/path_{k}/conv")
                _bn_at(state_dict, f"{tprefix}.conv.3.path_convs.{k}.1", params, stats, f"{dest}/conv_1/path_{k}/bn")
            _conv_at(state_dict, f"{tprefix}.conv.3.sa.1", params, stats, f"{dest}/conv_1/sa/fc1/conv")
            _bn_at(state_dict, f"{tprefix}.conv.3.sa.2", params, stats, f"{dest}/conv_1/sa/fc1/bn")
            _conv_at(state_dict, f"{tprefix}.conv.3.sa.4", params, stats, f"{dest}/conv_1/sa/fc2/conv")
        # shortcut projection
        if f"{tprefix}.downsample.0.weight" in state_dict and f"{tprefix}.downsample.0.running_mean" not in state_dict:
            _conv_at(state_dict, f"{tprefix}.downsample.0", params, stats, f"{dest}/downsample/proj/conv")
            _bn_at(state_dict, f"{tprefix}.downsample.1", params, stats, f"{dest}/downsample/proj/bn")
        elif f"{tprefix}.downsample.1.weight" in state_dict:  # avg-pool variant
            _conv_at(state_dict, f"{tprefix}.downsample.1", params, stats, f"{dest}/downsample/proj/conv")
            _bn_at(state_dict, f"{tprefix}.downsample.2", params, stats, f"{dest}/downsample/proj/bn")

    for i, nb in enumerate(module.num_blocks):
        for j in range(nb):
            convert_block(f"features.{idx}.{j}", f"layer_{i}_{j}", None, None)
        idx += 1

    _dense_at(state_dict, "head", params, "head")
    return {"params": params, "batch_stats": stats}


def convert_rexblock(state_dict, tp, dest, params, stats, expanded: bool, use_se: bool):
    """Maps one torch ReXBlock's ``conv`` Sequential (rexnet.py:69-143)."""
    off = 0
    if expanded:
        _conv_at(state_dict, f"{tp}.{off}", params, stats, f"{dest}/expand/conv")
        _bn_at(state_dict, f"{tp}.{off + 1}", params, stats, f"{dest}/expand/bn")
        off += 3
    _conv_at(state_dict, f"{tp}.{off}", params, stats, f"{dest}/dw/conv")
    _bn_at(state_dict, f"{tp}.{off + 1}", params, stats, f"{dest}/dw/bn")
    off += 2
    if use_se:
        se = f"{tp}.{off}.conv"
        _conv_at(state_dict, f"{se}.0", params, stats, f"{dest}/se/fc1/conv")
        _bn_at(state_dict, f"{se}.1", params, stats, f"{dest}/se/fc1/bn")
        _conv_at(state_dict, f"{se}.3", params, stats, f"{dest}/se/fc2/conv")
        off += 1
    off += 1  # activation
    _conv_at(state_dict, f"{tp}.{off}", params, stats, f"{dest}/project/conv")
    _bn_at(state_dict, f"{tp}.{off + 1}", params, stats, f"{dest}/project/bn")


@register_converter("ReXNet")
def _convert_rexnet(module, state_dict):
    """Maps the reference ReXNet Sequential indices (rexnet.py:146-231)."""
    from math import ceil

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    num_blocks = [ceil(e * module.depth_mult) for e in [1, 2, 2, 3, 3, 5]]
    depth = sum(num_blocks)
    ses = [False] * (num_blocks[0] + num_blocks[1]) + [module.use_se] * sum(num_blocks[2:])

    _conv_at(state_dict, "features.0", params, stats, "stem/conv")
    _bn_at(state_dict, "features.1", params, stats, "stem/bn")

    t = 1
    for i in range(depth):
        convert_rexblock(state_dict, f"features.{3 + i}.conv", f"block_{i}", params, stats, t != 1, ses[i])
        t = 6

    _conv_at(state_dict, f"features.{3 + depth}", params, stats, "penultimate/conv")
    _bn_at(state_dict, f"features.{4 + depth}", params, stats, "penultimate/bn")
    _dense_at(state_dict, "head.1", params, "head")
    return {"params": params, "batch_stats": stats}


def convert_darknet_body_v2(layout, state_dict, params, stats, src: str = "features.", dest: str = "features/"):
    """Body-only mapping for DarknetBodyV2 (reused by darknet19 and YOLOv2's backbone)."""
    _conv_at(state_dict, f"{src}stem.0", params, stats, f"{dest}stem/conv")
    _bn_at(state_dict, f"{src}stem.1", params, stats, f"{dest}stem/bn")
    for i, (_, num_blocks) in enumerate(layout):
        # layer Sequential: [maxpool, conv, bn, act] + num_blocks * 2 x [conv, bn, act]
        idx = 1
        for b in range(2 * num_blocks + 1):
            _conv_at(state_dict, f"{src}layers.{i}.{idx}", params, stats, f"{dest}layer_{i}_{b}/conv")
            _bn_at(state_dict, f"{src}layers.{i}.{idx + 1}", params, stats, f"{dest}layer_{i}_{b}/bn")
            idx += 3


@register_converter("DarknetV2")
def _convert_darknetv2(module, state_dict):
    """Maps darknetv2.py:32-185 (stem + maxpool/conv stages + 1x1 conv classifier)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    convert_darknet_body_v2(module.layout, state_dict, params, stats)
    _conv_at(state_dict, "classifier", params, stats, "classifier")
    return {"params": params, "batch_stats": stats}


@register_converter("DarknetV3")
def _convert_darknetv3(module, state_dict):
    """Maps darknetv3.py:73-196 (stem + strided conv + ResBlocks per stage)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    _conv_at(state_dict, "features.stem.0", params, stats, "features/stem/conv")
    _bn_at(state_dict, "features.stem.1", params, stats, "features/stem/bn")
    for i, (_, num_blocks) in enumerate(module.layout):
        base = f"features.layers.{i}"
        _conv_at(state_dict, f"{base}.0", params, stats, f"features/layer_{i}_conv/conv")
        _bn_at(state_dict, f"{base}.1", params, stats, f"features/layer_{i}_conv/bn")
        for b in range(num_blocks):
            tp = f"{base}.{3 + b}.conv"
            dest = f"features/layer_{i}_block_{b}"
            _conv_at(state_dict, f"{tp}.0", params, stats, f"{dest}/conv_0/conv")
            _bn_at(state_dict, f"{tp}.1", params, stats, f"{dest}/conv_0/bn")
            _conv_at(state_dict, f"{tp}.3", params, stats, f"{dest}/conv_1/conv")
            _bn_at(state_dict, f"{tp}.4", params, stats, f"{dest}/conv_1/bn")
    _dense_at(state_dict, "classifier", params, "classifier")
    return {"params": params, "batch_stats": stats}


@register_converter("DarknetV4")
def _convert_darknetv4(module, state_dict):
    """Maps darknetv4.py:38-226 (CSP stages). A configured drop_layer adds a
    (param-free) DropBlock entry to every conv_sequence, shifting indices by one."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    convert_darknet_body_v4(module.layout, state_dict, params, stats, has_drop=module.drop_layer is not None)
    _dense_at(state_dict, "classifier", params, "classifier")
    return {"params": params, "batch_stats": stats}


def convert_darknet_body_v4(layout, state_dict, params, stats, src: str = "features.", dest: str = "features/", has_drop: bool = False):
    """Body-only mapping for DarknetBodyV4 (reused by cspdarknet53 and YOLOv4)."""
    step = 4 if has_drop else 3  # conv, bn, act(, drop)
    _conv_at(state_dict, f"{src}stem.0", params, stats, f"{dest}stem/conv")
    _bn_at(state_dict, f"{src}stem.1", params, stats, f"{dest}stem/bn")
    for i, (_, num_blocks) in enumerate(layout):
        base = f"{src}stages.{i}"
        dest_i = f"{dest}stage_{i}"
        _conv_at(state_dict, f"{base}.base_layer.0", params, stats, f"{dest_i}/base_0/conv")
        _bn_at(state_dict, f"{base}.base_layer.1", params, stats, f"{dest_i}/base_0/bn")
        _conv_at(state_dict, f"{base}.base_layer.{step}", params, stats, f"{dest_i}/base_1/conv")
        _bn_at(state_dict, f"{base}.base_layer.{step + 1}", params, stats, f"{dest_i}/base_1/bn")
        for b in range(num_blocks):
            tp = f"{base}.main.{b}.conv"
            bd = f"{dest_i}/main_{b}"
            _conv_at(state_dict, f"{tp}.0", params, stats, f"{bd}/conv_0/conv")
            _bn_at(state_dict, f"{tp}.1", params, stats, f"{bd}/conv_0/bn")
            _conv_at(state_dict, f"{tp}.{step}", params, stats, f"{bd}/conv_1/conv")
            _bn_at(state_dict, f"{tp}.{step + 1}", params, stats, f"{bd}/conv_1/bn")
        _conv_at(state_dict, f"{base}.main.{num_blocks}", params, stats, f"{dest_i}/main_conv/conv")
        _bn_at(state_dict, f"{base}.main.{num_blocks + 1}", params, stats, f"{dest_i}/main_conv/bn")
        _conv_at(state_dict, f"{base}.transition.0", params, stats, f"{dest_i}/transition/conv")
        _bn_at(state_dict, f"{base}.transition.1", params, stats, f"{dest_i}/transition/bn")


@register_converter("MobileOne")
def _convert_mobileone(module, state_dict):
    """Maps mobileone.py:31-235 (overparametrized depth/point blocks)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    k = module.overparam_factor

    def convert_block(tprefix, dest, stride):
        # DepthConvBlock: [bn?] + [1x1 seq] + k x [3x3 seq]
        idx = 0
        if stride == 1:
            _bn_at(state_dict, f"{tprefix}.0.{idx}", params, stats, f"{dest}/depth/bn")
            idx += 1
        _conv_at(state_dict, f"{tprefix}.0.{idx}.0", params, stats, f"{dest}/depth/conv_s_conv")
        _bn_at(state_dict, f"{tprefix}.0.{idx}.1", params, stats, f"{dest}/depth/conv_s_bn")
        for b in range(k):
            _conv_at(state_dict, f"{tprefix}.0.{idx + 1 + b}.0", params, stats, f"{dest}/depth/conv_{b}_conv")
            _bn_at(state_dict, f"{tprefix}.0.{idx + 1 + b}.1", params, stats, f"{dest}/depth/conv_{b}_bn")
        # PointConvBlock at index 2: [bn?] + k x [1x1 seq]
        pidx = 0
        if f"{tprefix}.2.0.running_mean" in state_dict:
            _bn_at(state_dict, f"{tprefix}.2.0", params, stats, f"{dest}/point/bn")
            pidx = 1
        for b in range(k):
            _conv_at(state_dict, f"{tprefix}.2.{pidx + b}.0", params, stats, f"{dest}/point/conv_{b}_conv")
            _bn_at(state_dict, f"{tprefix}.2.{pidx + b}.1", params, stats, f"{dest}/point/conv_{b}_bn")

    convert_block("features.0", "features_0", stride=2)
    for s, nb in enumerate(module.num_blocks):
        for j in range(nb):
            convert_block(f"features.{s + 1}.{j}", f"features_{s + 1}_{j}", stride=2 if j == 0 else 1)
    _dense_at(state_dict, "head", params, "head")
    return {"params": params, "batch_stats": stats}


@register_converter("ConvNeXt")
def _convert_convnext(module, state_dict):
    """Maps convnext.py:116-189 (patchify stem, blocks with LN/LayerScale, LN head)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def ln_at(prefix, dest):
        _set(params, f"{dest}/scale", jnp.asarray(_np(state_dict[f"{prefix}.weight"])))
        _set(params, f"{dest}/bias", jnp.asarray(_np(state_dict[f"{prefix}.bias"])))

    _conv_at(state_dict, "features.0", params, stats, "stem_conv")
    ln_at("features.1", "stem_norm")
    stage_base = 2
    out_planes = list(module.planes[1:]) + [module.planes[-1]]
    for s, nb in enumerate(module.num_blocks):
        for j in range(nb):
            tp = f"features.{stage_base + s}.{j}.conv"
            dest = f"stage_{s}_block_{j}"
            _conv_at(state_dict, f"{tp}.0", params, stats, f"{dest}/dwconv")
            ln_at(f"{tp}.1", f"{dest}/norm")
            _conv_at(state_dict, f"{tp}.2", params, stats, f"{dest}/pwconv1")
            _conv_at(state_dict, f"{tp}.4", params, stats, f"{dest}/pwconv2")
            _set(params, f"{dest}/layer_scale/weight", jnp.asarray(_np(state_dict[f"{tp}.5.weight"])))
        if module.planes[s] != out_planes[s]:
            # trailing downsample cell inside the stage Sequential
            tp = f"features.{stage_base + s}.{nb}"
            ln_at(f"{tp}.0", f"stage_{s}_down_norm")
            _conv_at(state_dict, f"{tp}.1", params, stats, f"stage_{s}_down_conv")
    ln_at("head.0", "head_norm")
    _dense_at(state_dict, "head.1", params, "head")
    return {"params": params, "batch_stats": stats}


@register_converter("DarknetV1")
def _convert_darknetv1(module, state_dict):
    """Maps darknet.py:29-129 (stem + maxpool/alternating-conv groups; no norm layers
    by default, so convs carry biases)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    has_norm = module.norm_layer is not None
    step = 3 if has_norm else 2  # conv(, bn), act
    _conv_at(state_dict, "features.stem.0", params, stats, "features/stem/conv")
    if has_norm:
        _bn_at(state_dict, "features.stem.1", params, stats, "features/stem/bn")
    for i, planes in enumerate(module.layout):
        idx = 1  # skip the maxpool
        for j in range(len(planes)):
            _conv_at(state_dict, f"features.layers.{i}.{idx}", params, stats, f"features/layer_{i}_{j}/conv")
            if has_norm:
                _bn_at(state_dict, f"features.layers.{i}.{idx + 1}", params, stats, f"features/layer_{i}_{j}/bn")
            idx += step
    _dense_at(state_dict, "classifier", params, "classifier")
    return {"params": params, "batch_stats": stats}


@register_converter("YOLOv2")
def _convert_yolov2_backbone(module, state_dict):
    """Backbone-only conversion for YOLOv2: maps a darknet19 classification checkpoint
    (filtered to ``features.*`` keys, reference yolov2.py:262-269) into the detector's
    ``backbone`` subtree. Head/neck params keep their current initialization — callers
    must merge (see ``load_pretrained_params``)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    convert_darknet_body_v2(module.layout, state_dict, params, stats, src="features.", dest="backbone/")
    return {"params": params, "batch_stats": stats, "__partial__": True}


@register_converter("YOLOv4")
def _convert_yolov4_backbone(module, state_dict):
    """Backbone-only conversion for YOLOv4 from a cspdarknet53_mish checkpoint
    (reference yolov4.py:707-720)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    convert_darknet_body_v4(
        module.layout, state_dict, params, stats, src="features.", dest="backbone/",
        has_drop=module.drop_layer is not None,
    )
    return {"params": params, "batch_stats": stats, "__partial__": True}


def merge_variables(base: Dict[str, Any], overlay: Dict[str, Any]) -> Dict[str, Any]:
    """Recursively grafts ``overlay`` leaves onto ``base`` (for partial checkpoints)."""
    out = dict(base)
    for k, v in overlay.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge_variables(out[k], v)
        else:
            out[k] = v
    return out


@register_converter("DynamicUNet")
def _convert_dynamic_unet(module, state_dict):
    """Maps the reference DynamicUNet (unet.py:282-377) for the released
    ``unet_rexnet13`` checkpoint: an IntermediateLayerGetter over the ReXNet-1.3x
    features ("encoder.{0,1}" stem + "encoder.{3..18}" blocks), no-norm bridge/decoder
    conv sequences (biased convs), UBlocks with pixel-shuffle upsampling, a final
    upsample, and a 1x1 classifier."""
    encoder_cls = type(module.encoder).__name__
    if encoder_cls != "ReXNetFeatures":
        raise NotImplementedError(f"no DynamicUNet conversion for encoder {encoder_cls}")
    from math import ceil

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    enc = module.encoder

    num_blocks = [ceil(e * enc.depth_mult) for e in [1, 2, 2, 3, 3, 5]]
    ses = [False] * (num_blocks[0] + num_blocks[1]) + [enc.use_se] * sum(num_blocks[2:])
    _conv_at(state_dict, "encoder.0", params, stats, "encoder/stem/conv")
    _bn_at(state_dict, "encoder.1", params, stats, "encoder/stem/bn")
    last_block = max(enc.out_blocks)
    for i in range(last_block + 1):
        convert_rexblock(state_dict, f"encoder.{3 + i}.conv", f"encoder/block_{i}", params, stats, i != 0, ses[i])

    # bridge: [bn, act, conv(bias), act, conv(bias), act]
    _bn_at(state_dict, "bridge.0", params, stats, "bridge_bn")
    _conv_at(state_dict, "bridge.2", params, stats, "bridge_0/conv")
    _conv_at(state_dict, "bridge.4", params, stats, "bridge_1/conv")

    num_decoders = len(enc.out_blocks)
    for k in range(num_decoders):
        _conv_at(state_dict, f"decoder.{k}.upsample.0", params, stats, f"decoder_{k}/up_conv/conv")
        _bn_at(state_dict, f"decoder.{k}.bn", params, stats, f"decoder_{k}/bn")
        _conv_at(state_dict, f"decoder.{k}.block.1", params, stats, f"decoder_{k}/conv_0/conv")
        _conv_at(state_dict, f"decoder.{k}.block.3", params, stats, f"decoder_{k}/conv_1/conv")

    if module.final_upsampling:
        _conv_at(state_dict, "upsample.0", params, stats, "final_up_conv/conv")
    _conv_at(state_dict, "classifier", params, stats, "classifier")
    return {"params": params, "batch_stats": stats}
