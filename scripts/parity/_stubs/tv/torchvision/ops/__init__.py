from . import boxes, misc, stochastic_depth  # noqa: F401
from .boxes import box_area, box_iou, nms  # noqa: F401
from .stochastic_depth import StochasticDepth  # noqa: F401
