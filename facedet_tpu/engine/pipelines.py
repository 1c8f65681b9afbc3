"""Composed pipelines: detect-first (v1) and enhance-first (v2).

Reference call flows:
  * v1 — pipeline_v1_detection_first/app_v1.py:16-106: adaptive slicing →
    SAHI detect → save face crops → Real-ESRGAN x4 on the crops.
  * v2 — pipeline_v2_enhancement_first/app_v2.py:19-156: whole-image
    Real-ESRGAN x4 → SAHI detect on the enhanced image → divide coords by the
    scale factor → results in original coordinates.
  * enhance-first YOLO variant — pipeline_v4_yolo/app_yolo_full.py:86-187 (x2).
  * bounded enhancement gate — eval/eval_official_widerface.py:147-158:
    a cheap low-conf pass decides whether SR is worth running.

The reference round-trips temp JPEGs between stages
(pipeline_v4_yolo/1_Inference.py:328-341, app_v2.py:105-106); here each
pipeline stays on device end-to-end — the enhanced image tensor feeds the tile
gather directly.
"""
from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from facedet_tpu.core.detections import Detections
from facedet_tpu.engine.detector import DetectionModel
from facedet_tpu.engine.enhancer import FaceEnhancer
from facedet_tpu.engine.predict import get_sliced_prediction
from facedet_tpu.engine.prediction import (
    PredictionResult,
    detections_to_object_predictions,
)
from facedet_tpu.ops.tiler import (
    fixed_grid_slice_params,
    half_image_slice_size,
)

__all__ = [
    "detect_first_pipeline",
    "enhance_first_pipeline",
    "quick_face_analysis",
]


def _slice_params(policy: str, h: int, w: int, cfg) -> tuple[int, int, float, float]:
    if policy == "half_image":
        sh, sw = half_image_slice_size(h, w)
        return sh, sw, cfg.overlap_height_ratio, cfg.overlap_width_ratio
    if policy == "fixed_grid":
        sh, sw, ov = fixed_grid_slice_params(h, w)
        return sh, sw, ov, ov
    return (
        cfg.slice_height or 640,
        cfg.slice_width or 640,
        cfg.overlap_height_ratio,
        cfg.overlap_width_ratio,
    )


def detect_first_pipeline(
    image: np.ndarray,
    detection_model: DetectionModel,
    enhancer: Optional[FaceEnhancer] = None,
    slice_policy: str = "half_image",
    slice_config=None,
    postprocess_config=None,
    crops_dir: Optional[str] = None,
    output_dir: Optional[str] = None,
) -> tuple[PredictionResult, dict]:
    """Pipeline v1: SAHI detect -> crop faces -> enhance crops.

    Returns (PredictionResult, enhancement stats dict)."""
    from facedet_tpu.utils.config import PostprocessConfig, SliceConfig
    from facedet_tpu.utils.viz import save_face_crops

    sc = slice_config or SliceConfig()
    pc = postprocess_config or PostprocessConfig()
    h, w = image.shape[:2]
    sh, sw, oh, ow = _slice_params(slice_policy, h, w, sc)
    result = get_sliced_prediction(
        image,
        detection_model,
        slice_height=sh,
        slice_width=sw,
        overlap_height_ratio=oh,
        overlap_width_ratio=ow,
        perform_standard_pred=sc.perform_standard_pred,
        postprocess_type=pc.postprocess_type,
        postprocess_match_metric=pc.postprocess_match_metric,
        postprocess_match_threshold=pc.postprocess_match_threshold,
        postprocess_class_agnostic=pc.postprocess_class_agnostic,
    )
    stats: dict = {"total": 0, "enhanced": 0, "failed": 0}
    if enhancer is not None and crops_dir is not None:
        from facedet_tpu.engine.enhancer import enhance_face_crops_batch

        t0 = time.perf_counter()
        save_face_crops(image, result.object_prediction_list, crops_dir)
        out_dir = output_dir or (crops_dir.rstrip("/") + "_enhanced")
        stats = enhance_face_crops_batch(crops_dir, out_dir, enhancer)
        result.durations_in_seconds["enhance"] = time.perf_counter() - t0
    return result, stats


def enhance_first_pipeline(
    image: np.ndarray,
    detection_model: DetectionModel,
    enhancer: FaceEnhancer,
    slice_policy: str = "fixed_grid",
    slice_config=None,
    postprocess_config=None,
    outscale: Optional[float] = None,
) -> PredictionResult:
    """Pipeline v2: whole-image SR -> SAHI detect on enhanced -> coords / scale.

    The returned PredictionResult carries the ORIGINAL image with boxes mapped
    back to original coordinates (app_v2.py:131-156); the enhanced array is
    attached as ``result.enhanced_image``."""
    from facedet_tpu.utils.config import PostprocessConfig, SliceConfig

    sc = slice_config or SliceConfig()
    pc = postprocess_config or PostprocessConfig()
    scale = float(outscale if outscale is not None else enhancer.outscale)

    t0 = time.perf_counter()
    img = np.asarray(image)
    x = jnp.asarray(img, jnp.float32) / 255.0 if img.dtype == np.uint8 else jnp.asarray(img)
    enhanced = enhancer.enhance_array(x, outscale=scale)
    jax.block_until_ready(enhanced)  # honest enhance timing (async dispatch)
    enhance_dt = time.perf_counter() - t0

    eh, ew = int(enhanced.shape[0]), int(enhanced.shape[1])
    sh, sw, oh, ow = _slice_params(slice_policy, eh, ew, sc)
    # the SR output stays ON DEVICE through the sliced detection (a x4
    # output is 16x the original pixels — fetching it only to re-upload the
    # padded canvas costs two transfers of the largest tensor in the
    # system); the single display fetch below doubles as enhanced_image
    result = get_sliced_prediction(
        enhanced,
        detection_model,
        slice_height=sh,
        slice_width=sw,
        overlap_height_ratio=oh,
        overlap_width_ratio=ow,
        perform_standard_pred=sc.perform_standard_pred,
        postprocess_type=pc.postprocess_type,
        postprocess_match_metric=pc.postprocess_match_metric,
        postprocess_match_threshold=pc.postprocess_match_threshold,
        postprocess_class_agnostic=pc.postprocess_class_agnostic,
    )

    # map detections back to original coordinates (divide by scale)
    det = result.detections
    h, w = img.shape[:2]
    kpts = jnp.asarray(det.kpts)
    det = Detections(
        boxes=jnp.clip(jnp.asarray(det.boxes) / scale, 0, max(h, w)),
        scores=jnp.asarray(det.scores),
        classes=jnp.asarray(det.classes),
        kpts=kpts.at[..., :2].divide(scale),
        valid=jnp.asarray(det.valid),
    )
    preds = detections_to_object_predictions(
        det, detection_model.category_mapping, full_shape=(h, w)
    )
    out = PredictionResult(
        image=img,
        object_prediction_list=preds,
        durations_in_seconds={**result.durations_in_seconds, "enhance": enhance_dt},
        detections=det,
    )
    out.enhanced_image = result.image  # type: ignore[attr-defined]
    return out


def quick_face_analysis(
    image: np.ndarray,
    detection_model: DetectionModel,
    small_face_px: float = 50.0,
    small_ratio_threshold: float = 0.5,
    probe_conf: float = 0.05,
) -> bool:
    """Bounded-enhancement gate (eval/eval_official_widerface.py:147-158):
    cheap low-confidence full-image pass; returns True when SR is warranted —
    small-face ratio > 0.5 or mean face size < 50px."""
    old_conf = detection_model.confidence_threshold
    try:
        detection_model.confidence_threshold = probe_conf
        detection_model.perform_inference(np.asarray(image))
        det = detection_model.original_predictions
    finally:
        detection_model.confidence_threshold = old_conf
    arr = det.to_numpy()
    boxes = arr["boxes"][arr["scores"] >= probe_conf]
    if boxes.shape[0] == 0:
        return False
    sizes = np.maximum(boxes[:, 2] - boxes[:, 0], boxes[:, 3] - boxes[:, 1])
    small_ratio = float(np.mean(sizes < small_face_px))
    return small_ratio > small_ratio_threshold or float(sizes.mean()) < small_face_px
