from facedet_tpu.eval.bbox_overlaps import bbox_overlaps
from facedet_tpu.eval.coco_map import coco_map
from facedet_tpu.eval.widerface_official import OfficialWiderFaceEvaluator, voc_ap
from facedet_tpu.eval.dual import DualWiderFaceEvaluator
