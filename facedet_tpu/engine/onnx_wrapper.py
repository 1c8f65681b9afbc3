"""Generic ONNX detection model: run any exported detector graph on TPU.

The reference's entire model zoo arrives as exported checkpoints consumed by
runtime packages (ultralytics YOLO/RT-DETR `.pt`, insightface `.onnx` through
onnxruntime — utils/yolo_wrapper.py:55, utils/insightface_wrapper.py:38-44).
This wrapper closes the loop for the ONNX route: any ultralytics
``model.export(format="onnx")`` artifact — YOLO(-pose) or RT-DETR — plugs
into the same ``DetectionModel`` contract and therefore into the fused SAHI
engine, evaluators and CLIs, executed as a jitted XLA program via
models/onnx_import.py (no onnxruntime).

Supported output layouts (auto-detected, or forced via ``output_layout``):

  * ``yolo``   — ``[B, 4+nc(+K*3), A]``: cxcywh **pixel** boxes + sigmoided
    class scores (+ optional pose keypoint rows), needs NMS. The standard
    ultralytics YOLO export head.
  * ``rtdetr`` — ``[B, Q, 4+nc]``: cxcywh boxes **normalized** to [0,1] +
    class scores, set-based (no NMS). The ultralytics RT-DETR export head.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from facedet_tpu.core.detections import Detections
from facedet_tpu.engine.detector import DetectionModel
from facedet_tpu.models.yolo_decode import decode_to_detections

__all__ = ["OnnxDetectionModel"]


class OnnxDetectionModel(DetectionModel):
    def __init__(
        self,
        *args,
        output_layout: str = "auto",
        num_keypoints: Optional[int] = None,
        nms_iou: float = 0.7,
        **kwargs,
    ):
        if output_layout not in ("auto", "yolo", "rtdetr"):
            raise ValueError(f"unknown output_layout {output_layout!r}")
        self.output_layout = output_layout
        self._num_keypoints = num_keypoints
        self.nms_iou = nms_iou
        super().__init__(*args, **kwargs)

    @property
    def num_keypoints(self) -> int:
        return self._num_keypoints or 5

    def load_model(self) -> None:
        from facedet_tpu.models.onnx_import import import_onnx

        if not self.model_path:
            raise ValueError("OnnxDetectionModel requires model_path=<file.onnx>")
        self._onnx = import_onnx(str(self.model_path))
        self.model = None
        self.variables = {"params": self._onnx.params}
        hw = self._onnx.input_hw()
        if hw and not self.image_size:
            self.image_size = max(hw)

    def _classify_layout(self, out) -> str:
        if self.output_layout != "auto":
            return self.output_layout
        # YOLO exports are channels-first [B, C, A] with far more anchors than
        # channels; RT-DETR is [B, Q, 4+nc] with Q >> channels
        return "yolo" if out.shape[1] < out.shape[2] else "rtdetr"

    def tile_forward(self, variables, tiles, conf_threshold: float) -> Detections:
        # ultralytics export contract: float32 [0,1] RGB NCHW
        x = jnp.transpose(tiles.astype(jnp.float32), (0, 3, 1, 2))
        out = jax.vmap(lambda xi: self._onnx(variables["params"], xi[None])[0])(x)
        out = out.reshape((tiles.shape[0],) + out.shape[-2:])
        layout = self._classify_layout(out)

        if layout == "yolo":
            out = jnp.swapaxes(out, 1, 2)  # [T, A, C]
            nc = out.shape[-1] - 4
            nk = 0
            if self._num_keypoints:
                nk = self._num_keypoints
                nc -= nk * 3
            cxcywh = out[..., :4]
            scores = out[..., 4 : 4 + nc]
            preds = {
                "boxes": _cxcywh_to_xyxy(cxcywh),
                "scores": scores,
            }
            if nk:
                preds["kpts"] = out[..., 4 + nc :].reshape(
                    out.shape[0], out.shape[1], nk, 3
                )
            return decode_to_detections(
                preds,
                conf_threshold=conf_threshold,
                max_detections=self.max_detections_per_tile,
                nms_iou=self.nms_iou,
                class_agnostic=True,
            )

        # rtdetr: normalized cxcywh, set predictions -> top-k, no NMS.
        # Denormalize per axis — tiles can be non-square (slice_height !=
        # slice_width), and height-for-both silently shrinks x-extents
        wh = jnp.array(
            [tiles.shape[2], tiles.shape[1], tiles.shape[2], tiles.shape[1]],
            out.dtype,
        )
        boxes = _cxcywh_to_xyxy(out[..., :4]) * wh
        scores = out[..., 4:]
        return decode_to_detections(
            {"boxes": boxes, "scores": scores},
            conf_threshold=conf_threshold,
            max_detections=self.max_detections_per_tile,
            with_nms=False,
        )


def _cxcywh_to_xyxy(b):
    cx, cy, w, h = jnp.split(b, 4, -1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
