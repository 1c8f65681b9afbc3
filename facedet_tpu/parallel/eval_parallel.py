"""Data-parallel evaluation: shard the image stream across devices.

The reference evaluates ~3.2k WIDERFACE images serially on one device
(eval/eval_official_widerface.py:254-278). Here the stream is round-robined
across all local devices — each image's fused sliced pipeline executes on its
assigned device with replicated weights, giving near-linear throughput without
any cross-device dependency (the per-image merge is self-contained).
"""
from __future__ import annotations

from collections import deque
from typing import Iterable, Optional

import jax
import numpy as np

__all__ = ["predict_stream_multidevice"]


def predict_stream_multidevice(
    images: Iterable[np.ndarray],
    detection_model,
    devices: Optional[list] = None,
    window_per_device: int = 2,
    raw: bool = True,
    **sliced_kwargs,
):
    """Yield results in submission order while keeping up to
    ``window_per_device * len(devices)`` images in flight across devices."""
    from facedet_tpu.engine.predict import (
        _dispatch_sliced,
        _prepare_image,
        detections_to_object_predictions,
    )
    from facedet_tpu.engine.prediction import PredictionResult

    devices = devices or jax.devices()
    n_dev = len(devices)
    # replicate weights once per device
    per_device_vars = [jax.device_put(detection_model.variables, d) for d in devices]

    opts = dict(
        slice_height=sliced_kwargs.get("slice_height"),
        slice_width=sliced_kwargs.get("slice_width"),
        overlap_height_ratio=sliced_kwargs.get("overlap_height_ratio", 0.2),
        overlap_width_ratio=sliced_kwargs.get("overlap_width_ratio", 0.2),
        perform_standard_pred=sliced_kwargs.get("perform_standard_pred", True),
        postprocess_type=sliced_kwargs.get("postprocess_type", "NMS"),
        postprocess_match_metric=sliced_kwargs.get("postprocess_match_metric", "IOU"),
        postprocess_match_threshold=sliced_kwargs.get("postprocess_match_threshold", 0.5),
        postprocess_class_agnostic=sliced_kwargs.get("postprocess_class_agnostic", True),
        auto_slice_resolution=True,
        merge_capacity=sliced_kwargs.get("merge_capacity", 1024),
        use_pallas_gather=False,
    )

    saved_vars = detection_model.variables
    inflight: deque = deque()

    def finalize(img, dev_det):
        merged = jax.device_get(dev_det)
        if raw:
            return merged
        preds = detections_to_object_predictions(
            merged, detection_model.category_mapping, full_shape=img.shape[:2]
        )
        return PredictionResult(
            image=img, object_prediction_list=preds, detections=merged
        )

    try:
        for i, image in enumerate(images):
            dev_idx = i % n_dev
            img = _prepare_image(image)
            detection_model.variables = per_device_vars[dev_idx]
            dev_img = jax.device_put(img, devices[dev_idx])
            dev_det, _g, _t, _d = _dispatch_sliced(dev_img, detection_model, **opts)
            inflight.append((img, dev_det))
            if len(inflight) >= window_per_device * n_dev:
                yield finalize(*inflight.popleft())
        while inflight:
            yield finalize(*inflight.popleft())
    finally:
        detection_model.variables = saved_vars
