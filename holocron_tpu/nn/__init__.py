from . import functional, init
from .modules import *
