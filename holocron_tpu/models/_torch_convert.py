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
