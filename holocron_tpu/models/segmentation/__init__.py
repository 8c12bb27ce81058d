from .unet import *
from .unet3p import *
from .unetpp import *
