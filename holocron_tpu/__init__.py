"""holocron-tpu: a TPU-native computer-vision framework in JAX.

From-scratch rebuild of the capabilities of `frgfm/Holocron` for TPU:
NHWC/bfloat16 Flax models, pure-function losses, optax-style optimizers, a jitted
mesh-sharded trainer, and Pallas kernels on the hot paths.
"""

from . import models, nn, ops, optim, parallel, quant, trainer, transforms, utils

__version__ = "0.1.0.dev0"
