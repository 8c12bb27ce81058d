"""Service configuration (analog of api/app/config.py:14-26 — env-driven settings)."""

import os

PROJECT_NAME: str = os.environ.get("PROJECT_NAME", "holocron-tpu API")
PROJECT_DESCRIPTION: str = "Image classification API built on holocron-tpu"
VERSION: str = "0.1.0.dev0"
ARCH: str = os.environ.get("HOLOCRON_ARCH", "rexnet1_0x")
NUM_CLASSES: int = int(os.environ.get("HOLOCRON_NUM_CLASSES", "10"))
CHECKPOINT: str = os.environ.get("HOLOCRON_CHECKPOINT", "")
HOST: str = os.environ.get("API_HOST", "0.0.0.0")
PORT: int = int(os.environ.get("API_PORT", "8050"))
MAX_BATCH: int = int(os.environ.get("HOLOCRON_MAX_BATCH", "8"))
BATCH_WAIT_MS: float = float(os.environ.get("HOLOCRON_BATCH_WAIT_MS", "5"))
# serve the selective-int8 deploy form (holocron_tpu.quant; up to 1.95x on wide archs).
# "1" honors the measured per-arch policy (falls back to bf16 where int8 loses);
# "force" quantizes regardless.
_q = os.environ.get("HOLOCRON_QUANTIZE", "0")
QUANTIZE = "force" if _q == "force" else _q == "1"
