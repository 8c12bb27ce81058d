"""Model loading + preprocessing for the inference service.

Analog of api/app/vision.py:23-62: the reference serves an ONNXRuntime session exported
offline; here the service runs the jitted deploy-form model directly (reparametrized
when supported), with the same preprocessing contract (default_cfg mean/std, 224px).
"""

import io
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
    return model


MODEL = None
CLASSES: List[str] = IMAGENETTE.classes


def get_model():
    global MODEL
    if MODEL is None:
        MODEL = load_model()
    return MODEL


def decode_image(img_data: bytes):
    from PIL import Image

    return Image.open(io.BytesIO(img_data)).convert("RGB")


def preprocess_image(pil_img) -> np.ndarray:
    """Resize to 224px + normalize with the preset stats (vision.py:35-53)."""
    img = pil_img.resize((224, 224))
    arr = np.asarray(img, dtype=np.float32) / 255.0
    arr = (arr - np.asarray(IMAGENETTE.mean, np.float32)) / np.asarray(IMAGENETTE.std, np.float32)
    return arr[None]  # (1, 224, 224, 3)


def classify_image(img_data: bytes) -> Tuple[str, float]:
    model = get_model()
    x = jnp.asarray(preprocess_image(decode_image(img_data)))
    logits = model(x)
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))[0]
    idx = int(probs.argmax())
    label = CLASSES[idx] if idx < len(CLASSES) else str(idx)
    return label, float(probs[idx])
