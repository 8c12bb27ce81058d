from . import boxes
from .boxes import *
