from .functional import fused_preprocess
from .interpolation import RandomZoomOut, Resize, ResizeMethod
