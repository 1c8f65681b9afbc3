"""YOLOv11 head decode: DFL expectation, anchor grids, keypoint decode, and
fixed-capacity top-k + NMS into ``Detections``.

Replaces the decode the reference delegates to ultralytics' predictor
(utils/yolo_wrapper.py:74-82: ``model.predict(conf, device, imgsz)``), but as a
pure jittable function over the whole tile batch. Dynamic "number of boxes"
becomes a static ``max_detections`` capacity with a validity mask.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from facedet_tpu.core.detections import Detections
from facedet_tpu.models.yolov11 import REG_MAX, STRIDES
from facedet_tpu.ops.nms import merge_detections

__all__ = ["decode_predictions", "decode_to_detections"]


def _level_anchors(h: int, w: int, stride: int) -> tuple[jax.Array, jax.Array]:
    """Anchor cell centers (x, y) in input-pixel units and stride vector."""
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5)
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    pts = jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)  # cell units
    return pts, jnp.full((h * w,), float(stride), jnp.float32)


def decode_predictions(level_outputs: list[dict]) -> dict:
    """Per-level raw maps -> flat per-anchor predictions.

    Returns dict with:
      boxes  [B, A, 4] xyxy in input pixels
      scores [B, A, C] sigmoid class probabilities
      kpts   [B, A, K, 3] decoded keypoints (if the head has a pose branch)
    """
    boxes, scores, kpts = [], [], []
    proj = jnp.arange(REG_MAX, dtype=jnp.float32)
    for level, stride in zip(level_outputs, STRIDES):
        box_map = level["box"]  # [B, h, w, 4*REG_MAX]
        b, h, w, _ = box_map.shape
        anchors, strides = _level_anchors(h, w, stride)

        dist = box_map.reshape(b, h * w, 4, REG_MAX)
        dist = jnp.sum(jax.nn.softmax(dist, axis=-1) * proj, axis=-1)  # [B,A,4] ltrb
        x1y1 = (anchors[None] - dist[..., :2]) * strides[None, :, None]
        x2y2 = (anchors[None] + dist[..., 2:]) * strides[None, :, None]
        boxes.append(jnp.concatenate([x1y1, x2y2], axis=-1))

        cls = level["cls"]
        scores.append(jax.nn.sigmoid(cls.reshape(b, h * w, -1)))

        if "kpt" in level:
            km = level["kpt"].reshape(b, h * w, -1, 3)
            # slice-only formulation (no integer-index gathers): keeps the
            # trace ONNX-exportable and fuses as two elementwise ops
            axy = anchors[None, :, None, :]  # [1, A, 1, 2]
            kxy = (km[..., :2] * 2.0 + (axy - 0.5)) * strides[None, :, None, None]
            kv = jax.nn.sigmoid(km[..., 2:3])
            kpts.append(jnp.concatenate([kxy, kv], axis=-1))

    out = {
        "boxes": jnp.concatenate(boxes, axis=1),
        "scores": jnp.concatenate(scores, axis=1),
    }
    if kpts:
        out["kpts"] = jnp.concatenate(kpts, axis=1)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("max_detections", "nms_iou", "class_agnostic", "with_nms"),
)
def decode_to_detections(
    preds: dict,
    conf_threshold: float = 0.25,
    max_detections: int = 300,
    nms_iou: float = 0.7,
    class_agnostic: bool = True,
    with_nms: bool = True,
) -> Detections:
    """Flat per-anchor predictions -> per-image ``Detections`` (batched).

    Mirrors ultralytics' predictor defaults: confidence filter, top-k
    pre-select, class = argmax, IoU-0.7 NMS, max_det=300.
    """
    boxes, scores = preds["boxes"], preds["scores"]
    b, a, c = scores.shape
    best = jnp.max(scores, axis=-1)  # [B, A]
    cls = jnp.argmax(scores, axis=-1).astype(jnp.int32)
    valid = best >= conf_threshold

    k = min(max_detections, a)
    key = jnp.where(valid, best, -1.0)
    top_val, top_idx = jax.lax.top_k(key, k)  # [B, k]

    def gather(x, idx):
        return jnp.take_along_axis(x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1)

    sel_boxes = gather(boxes, top_idx)
    sel_cls = jnp.take_along_axis(cls, top_idx, axis=1)
    if "kpts" in preds:
        kk = preds["kpts"].shape[-2]
        sel_kpts = jnp.take_along_axis(
            preds["kpts"], top_idx[..., None, None], axis=1
        )
    else:
        sel_kpts = jnp.zeros((b, k, 5, 3), jnp.float32)

    det = Detections(
        boxes=sel_boxes,
        scores=jnp.maximum(top_val, 0.0),
        classes=sel_cls,
        kpts=sel_kpts,
        valid=top_val >= conf_threshold,
    )
    if with_nms:
        det = jax.vmap(
            lambda d: merge_detections(
                d,
                mode="NMS",
                match_metric="IOU",
                match_threshold=nms_iou,
                class_agnostic=class_agnostic,
            )
        )(det)
    return det
