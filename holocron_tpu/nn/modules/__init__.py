from .activation import *
from .attention import *
from .conv import *
from .downsample import *
from .dropblock import *
from .lambda_layer import *
from .loss import *
