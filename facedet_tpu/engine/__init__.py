from facedet_tpu.engine.detector import (
    DetectionModel,
    YoloV11PoseDetectionModel,
)
from facedet_tpu.engine.predict import (
    get_prediction,
    get_sliced_prediction,
    get_sliced_prediction_batch,
    predict_stream,
)
from facedet_tpu.engine.enhancer import FaceEnhancer
from facedet_tpu.engine.prediction import ObjectPrediction, PredictionResult
