"""Model loading + preprocessing for the inference service.

Analog of api/app/vision.py:23-62: the reference serves an ONNXRuntime session exported
offline; here the service runs the jitted deploy-form model directly (reparametrized
when supported), with the same preprocessing contract (default_cfg mean/std, 224px).
"""

import io
import time
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from holocron_tpu.models import classification
from holocron_tpu.models.presets import IMAGENETTE

from . import config


def load_model(arch: str = config.ARCH, num_classes: int = config.NUM_CLASSES):
    model = classification.__dict__[arch](num_classes=num_classes)
    model.init((1, 224, 224, 3))
    if config.CHECKPOINT:
        from pathlib import Path

        from flax import serialization

        state = serialization.msgpack_restore(Path(config.CHECKPOINT).read_bytes())
        model.load_variables(jax.tree.map(jnp.asarray, state.get("model", state)))
    if hasattr(model.module, "reparametrize"):
        model.reparametrize()
    if config.QUANTIZE:
        from holocron_tpu.quant import quantize_model, recommended_quantization

        # measured per-arch policy: int8 loses on concat-heavy U-Nets / grouped-conv
        # archs (docs/bench) — serving falls back to bf16 there rather than shipping
        # a slower AND less accurate model. HOLOCRON_QUANTIZE=force overrides.
        verdict = recommended_quantization(arch)
        if config.QUANTIZE != "force" and (verdict is None or not verdict["recommended"]):
            import logging

            # UNMEASURED archs fall back too (VERDICT r3 #6): quantizing blind risks
            # shipping a slower and less accurate model; only `force` may gamble.
            reason = (
                f"int8 measures {verdict['int8_speedup']:.2f}x vs bf16 on {arch} (docs/bench)"
                if verdict is not None
                else f"{arch} has no measured int8 policy entry (quant_policy.json)"
            )
            logging.getLogger(__name__).warning(
                f"HOLOCRON_QUANTIZE requested but {reason} — serving bf16; "
                "set HOLOCRON_QUANTIZE=force to override"
            )
            return model
        # dynamic per-request activation scales: no calibration set exists at serving
        # time, and the extra per-conv reduction fuses into the conv (docs/PERF.md)
        return quantize_model(model, arch=arch)
    return model


MODEL = None
BATCHER = None
CLASSES: List[str] = IMAGENETTE.classes


def get_model():
    global MODEL
    if MODEL is None:
        MODEL = load_model()
    return MODEL


def get_batcher():
    """Micro-batcher over the jitted model: concurrent requests coalesce into one
    padded device call (power-of-two buckets, see api/app/batcher.py)."""
    global BATCHER
    if BATCHER is None:
        from .batcher import MicroBatcher

        model = get_model()
        # const-weights deploy forward where available: XLA bakes the weights into
        # the executable, measured +7% bf16 / +27% int8 (docs/PERF.md). Weights are
        # final at serving time, so the snapshot semantics are safe here.
        # HOLOCRON_CONST_WEIGHTS=0 opts out (cold-start compile of the const form
        # is minutes through a remote-compile tunnel).
        import os

        use_const = os.environ.get("HOLOCRON_CONST_WEIGHTS", "1") == "1"
        fwd = model.deploy_forward() if use_const and hasattr(model, "deploy_forward") else model

        # softmax INSIDE the single jitted program: running jax.nn.softmax eagerly
        # on the logits was a second dispatch (and a second tunnel round trip on
        # remote-attached chips) per batch — measured in the round-4 serving
        # attribution (docs/PERF.md). One jit call, one device_get, per batch.
        #
        # The batch crosses the host->device link as uint8 (4x lighter than
        # normalized float32 — measured ~6 ms p50 at 224px through the TPU tunnel,
        # scripts/bench_serving.py) with /255 + mean/std folded into the same
        # program, mirroring the trainer's uint8 end-to-end input feed.
        mean = jnp.asarray(IMAGENETTE.mean, jnp.float32)
        std = jnp.asarray(IMAGENETTE.std, jnp.float32)

        @jax.jit
        def softmax_fwd(u8):
            x = (u8.astype(jnp.float32) * (1.0 / 255.0) - mean) / std
            return jax.nn.softmax(fwd(x), axis=-1)

        def infer(batch: np.ndarray) -> np.ndarray:
            return np.asarray(softmax_fwd(jnp.asarray(batch)))

        BATCHER = MicroBatcher(infer, max_batch=config.MAX_BATCH, max_wait_ms=config.BATCH_WAIT_MS)
    return BATCHER


def decode_image(img_data: bytes):
    """PIL decode — the fallback for non-JPEG payloads only (the JPEG hot path is
    native, see :func:`preprocess_bytes`)."""
    from PIL import Image

    return Image.open(io.BytesIO(img_data)).convert("RGB")


def preprocess_bytes(img_data: bytes):
    """Encoded image bytes -> batcher-ready (1, 224, 224, 3) uint8.

    JPEG payloads (the overwhelmingly common case) take the native path: libjpeg
    decode + bilinear resize fused in C++ (native/holocron_loader.cpp), zero PIL
    involvement. Anything else falls back to a PIL decode + resize. Both paths
    return uint8 HOST arrays: normalization folds into the micro-batcher's single
    jitted device call (see :func:`get_batcher`), and an eager device_put here
    would cost two extra tunnel RTTs (~60 ms, measured via
    scripts/bench_serving.py).
    """
    if img_data[:3] == b"\xff\xd8\xff":  # JPEG magic
        from holocron_tpu.utils.data import decode_batch_u8, native_available

        if native_available():
            try:
                return decode_batch_u8([img_data], 224, 224)
            except (ValueError, RuntimeError):
                pass  # corrupt JPEG or pre-v3 library: let PIL try
    from PIL import Image

    pil = decode_image(img_data).resize((224, 224), Image.BILINEAR)
    return np.asarray(pil, dtype=np.uint8)[None]


def classify_image(img_data: bytes) -> Tuple[str, float, dict]:
    """Returns ``(label, confidence, timings)``; ``timings`` carries the per-stage
    latency attribution (decode/queue/infer ms + coalesced batch size) the servers
    surface as ``X-*-Time`` response headers — the reference only reports a total
    X-Process-Time (api/app/main.py:42-48)."""
    t0 = time.perf_counter()
    x = np.asarray(preprocess_bytes(img_data))
    decode_ms = (time.perf_counter() - t0) * 1e3
    result = get_batcher().submit(x)
    probs = result["probs"]
    idx = int(probs.argmax())
    label = CLASSES[idx] if idx < len(CLASSES) else str(idx)
    timings = {
        "decode_ms": decode_ms,
        "queue_ms": result["queue_ms"],
        "infer_ms": result["infer_ms"],
        "batch_size": result["batch_size"],
    }
    return label, float(probs[idx]), timings
