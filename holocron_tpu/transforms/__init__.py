from .interpolation import RandomZoomOut, Resize, ResizeMethod
