"""facedet_tpu — TPU-native sliced face detection + super-resolution framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``Face-Detection-With-YOLOv11-SAHI-and-Real-ESRGAN`` (see SURVEY.md): SAHI
sliced inference, YOLOv11-pose / SCRFD / RT-DETR detector families,
Real-ESRGAN enhancement pipelines, and the full WIDERFACE evaluation stack —
designed TPU-first (static shapes, fused single-dispatch pipelines, mesh
sharding) rather than ported.

Public API mirrors the reference's entry points:
    from facedet_tpu import get_prediction, get_sliced_prediction, predict
    from facedet_tpu import YoloV11PoseDetectionModel, FaceEnhancer
"""

__version__ = "0.1.0"

from facedet_tpu.core.detections import Detections
from facedet_tpu.engine.detector import DetectionModel, YoloV11PoseDetectionModel
from facedet_tpu.engine.enhancer import FaceEnhancer, enhance_face_crops_batch
from facedet_tpu.engine.predict import get_prediction, get_sliced_prediction
from facedet_tpu.engine.prediction import ObjectPrediction, PredictionResult

__all__ = [
    "Detections",
    "DetectionModel",
    "YoloV11PoseDetectionModel",
    "FaceEnhancer",
    "enhance_face_crops_batch",
    "get_prediction",
    "get_sliced_prediction",
    "ObjectPrediction",
    "PredictionResult",
    "predict",
]


def predict(*args, **kwargs):
    """Batch driver (lazy import; see engine/batch_predict.py)."""
    from facedet_tpu.engine.batch_predict import predict as _predict

    return _predict(*args, **kwargs)
