from facedet_tpu.core import boxes
from facedet_tpu.core.detections import Detections, concat_detections
from facedet_tpu.core.letterbox import LetterboxSpec, compute_letterbox
