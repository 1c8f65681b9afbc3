from facedet_tpu.models.yolov11 import YoloConfig, YoloV11, create_yolo
from facedet_tpu.models.rrdbnet import RRDBConfig, RRDBNet
from facedet_tpu.models.scrfd import Scrfd, ScrfdConfig
from facedet_tpu.models.rtdetr import RtDetr, RtDetrConfig
