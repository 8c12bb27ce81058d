from . import checkpoints, presets
from .checkpoints import *
from .core import Model
from .utils import ConvSequence, conv_sequence, fuse_conv_bn, load_pretrained_params, model_from_hf_hub
from . import classification, detection, segmentation
from .classification import *
from .segmentation import *
from .detection import *
