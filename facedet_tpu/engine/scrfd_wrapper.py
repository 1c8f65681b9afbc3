"""SCRFD/RetinaFace detection model wrappers.

Mirrors both reference wrappers:
  * ``InsightFaceDetectionModel`` (utils/insightface_wrapper.py:7-113):
    DetectionModel subclass with det_size/det_thresh semantics.
  * the hardened ``RetinaFaceSAHIDetectionModel`` (docs
    sahi/retinaface_sahi.py:19-279): det_size guard + re-prepare (:116-124) and
    bbox clamping (:153-154) — here the guard is shape bucketing and clamping
    is the engine's clip stage.
Plus a ``FaceAnalysis``-style facade (prepare/get) used by the raw
app_retinaface path (pipeline_v1_detection_first/app_retinaface.py:6-31).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from facedet_tpu.core.detections import Detections
from facedet_tpu.engine.detector import DetectionModel, load_params_npz
from facedet_tpu.models.scrfd import (
    SCRFD_VARIANTS,
    Scrfd,
    decode_scrfd,
    decode_scrfd_flat,
)
from facedet_tpu.models.yolo_decode import decode_to_detections


class ScrfdDetectionModel(DetectionModel):
    """SCRFD DetectionModel (reference utils/insightface_wrapper.py:7)."""

    def __init__(
        self,
        *args,
        variant: str = "scrfd_2.5g",
        det_thresh: Optional[float] = None,
        dtype: str = "bfloat16",
        **kwargs,
    ):
        self.variant = variant
        self.dtype = dtype
        if det_thresh is not None:
            kwargs["confidence_threshold"] = det_thresh
        super().__init__(*args, **kwargs)

    def load_model(self) -> None:
        cfg = SCRFD_VARIANTS[self.variant]
        self.cfg = dataclasses.replace(cfg, dtype=self.dtype)
        self._onnx = None
        if str(self.model_path).endswith(".onnx"):
            # pretrained insightface checkpoint: import the ONNX graph as a
            # jittable JAX function (reference feeds the same file to
            # onnxruntime — utils/insightface_wrapper.py:38-44)
            from facedet_tpu.models.onnx_import import import_onnx

            self._onnx = import_onnx(str(self.model_path))
            self.model = None
            self.variables = {"params": self._onnx.params}
            hw = self._onnx.input_hw()
            if hw and not self.image_size:
                self.image_size = max(hw)
            return
        self.model = Scrfd(self.cfg)
        if self.model_path is None:
            with jax.default_device(jax.local_devices(backend="cpu")[0]):
                self.variables = self.model.init(
                    jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
                )
        elif str(self.model_path).endswith(".npz"):
            self.variables = load_params_npz(self.model_path)
        else:
            raise ValueError(f"unsupported checkpoint format: {self.model_path}")

    def tile_forward(self, variables, tiles, conf_threshold: float) -> Detections:
        if self._onnx is not None:
            # insightface blob semantics: (pix*255 - 127.5)/128, NCHW, RGB
            x = (tiles.astype(jnp.float32) * 255.0 - 127.5) / 128.0
            x = jnp.transpose(x, (0, 3, 1, 2))
            # vmap with an inner batch of 1 so graphs exported batch-1 (the
            # published checkpoints) run over the whole tile batch in one XLA
            # program
            outs = jax.vmap(lambda xi: self._onnx(variables["params"], xi[None]))(x)
            outs = [o.reshape(o.shape[0], -1, o.shape[-1]) for o in outs]
            preds = decode_scrfd_flat(outs, tiles.shape[1:3])
        else:
            level_outs = self.model.apply(variables, tiles, train=False)
            preds = decode_scrfd(level_outs, num_keypoints=self.cfg.num_keypoints)
        return decode_to_detections(
            preds,
            conf_threshold=conf_threshold,
            max_detections=self.max_detections_per_tile,
            nms_iou=0.4,  # insightface SCRFD default nms_thresh
            class_agnostic=True,
        )


@dataclasses.dataclass
class Face:
    """insightface-style result record (.bbox xyxy, .kps [5,2], .det_score)."""

    bbox: np.ndarray
    kps: np.ndarray
    det_score: float


class FaceAnalysis:
    """Facade matching insightface.app.FaceAnalysis for the raw direct-detect
    path (reference app_retinaface.py / utils/download_models.py:16-25)."""

    def __init__(
        self,
        name: str = "scrfd_2.5g",
        providers: Optional[list] = None,  # accepted for signature parity
        model_path: Optional[str] = None,
    ):
        self.variant = name if name in SCRFD_VARIANTS else "scrfd_2.5g"
        self.model_path = model_path
        self.det_size = (640, 640)
        self.det_thresh = 0.5
        self._model: Optional[ScrfdDetectionModel] = None

    def prepare(self, ctx_id: int = 0, det_size=(640, 640), det_thresh: float = 0.5):
        """det_size guard: non-positive sizes self-heal to 640 (reference
        docs sahi/retinaface_sahi.py:116-124)."""
        w, h = det_size
        if w <= 0 or h <= 0:
            w = h = 640
        self.det_size = (int(w), int(h))
        self.det_thresh = float(det_thresh)
        self._model = ScrfdDetectionModel(
            variant=self.variant,
            model_path=self.model_path,
            confidence_threshold=self.det_thresh,
            image_size=max(self.det_size),
        )

    def get(self, image: np.ndarray) -> list[Face]:
        if self._model is None:
            self.prepare()
        self._model.perform_inference(np.asarray(image))
        det = self._model.original_predictions
        arr = det.to_numpy()
        keep = arr["scores"] >= self.det_thresh
        faces = []
        h, w = np.asarray(image).shape[:2]
        for box, score, kpts in zip(arr["boxes"][keep], arr["scores"][keep], arr["kpts"][keep]):
            box = np.clip(box, [0, 0, 0, 0], [w, h, w, h])  # clamp (:153-154)
            faces.append(Face(bbox=box, kps=kpts[:, :2].copy(), det_score=float(score)))
        return faces
