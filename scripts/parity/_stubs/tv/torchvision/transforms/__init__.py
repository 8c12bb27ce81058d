from . import functional, transforms  # noqa: F401
from .functional import InterpolationMode  # noqa: F401
from .transforms import Resize  # noqa: F401
