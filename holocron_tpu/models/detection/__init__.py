from ._utils import detections_to_list, masked_nms, pad_targets, post_process
from .yolo import *
from .yolov2 import *
from .yolov4 import *
