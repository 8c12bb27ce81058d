from .repvgg import *
from .resnet import *
from .rexnet import *
