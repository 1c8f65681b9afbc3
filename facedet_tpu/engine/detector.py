"""Detector model abstraction — the TPU-native ``DetectionModel`` family.

Mirrors the reference ABC (docs sahi/base.py:12-197: ctor contract,
``load_model``, ``perform_inference``, ``convert_original_predictions``,
``object_prediction_list``), but the compute contract is tensor-first: every
model exposes ``forward_tiles(tiles) -> Detections`` — a jitted, batched,
static-shape function over a whole SAHI tile batch — and the Python-object API
exists only as a compatibility edge.

Weights: ``model_path`` may be a ``.npz`` of flat ``params/...`` arrays (the
output of models/convert.py's ultralytics converter), an orbax checkpoint dir,
or ``None`` for random initialisation (benchmarks / tests).
"""
from __future__ import annotations

import functools
import os
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from facedet_tpu.core.detections import Detections
from facedet_tpu.core.letterbox import (
    apply_letterbox,
    compute_letterbox,
    unletterbox_boxes,
    unletterbox_kpts,
)
from facedet_tpu.engine.prediction import detections_to_object_predictions

DEFAULT_CATEGORY_MAPPING = {"0": "face"}


def load_params_npz(path: str) -> dict:
    """Flat 'a/b/c' -> nested variables dict. float16 entries (the compact
    committed-asset encoding, see ``save_params_npz(half=True)``) are widened
    back to float32 — compute dtype is the model's concern, not storage's."""
    flat = np.load(path)
    tree: dict = {}
    for key in flat.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        arr = flat[key]
        if arr.dtype == np.float16:
            arr = arr.astype(np.float32)
        node[parts[-1]] = jnp.asarray(arr)
    return tree


def save_params_npz(path: str, variables: dict, half: bool = False) -> None:
    """``half=True`` stores float32 arrays as float16 (compressed): ~4x
    smaller on disk, for checkpoints committed to the repo as assets."""
    flat = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}/{k}" if prefix else k)
        else:
            arr = np.asarray(node)
            if half and arr.dtype == np.float32:
                arr = arr.astype(np.float16)
            flat[prefix] = arr

    walk(variables, "")
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)  # a 10-min trained EMA must never
    # die on a missing output directory (it did once)
    (np.savez_compressed if half else np.savez)(path, **flat)


class DetectionModel:
    """Base detector (reference docs sahi/base.py:12).

    Subclasses implement ``load_model`` and ``forward_tiles``.
    """

    def __init__(
        self,
        model_path: Optional[str] = None,
        device: Optional[str] = None,
        confidence_threshold: float = 0.3,
        category_mapping: Optional[dict] = None,
        image_size: Optional[int] = None,
        load_at_init: bool = True,
        max_detections_per_tile: int = 300,
        **kwargs: Any,
    ):
        self.model_path = model_path
        self.device = device
        self.confidence_threshold = confidence_threshold
        self.category_mapping = category_mapping or dict(DEFAULT_CATEGORY_MAPPING)
        self.image_size = image_size
        self.max_detections_per_tile = max_detections_per_tile
        self.model: Any = None
        self.variables: Any = None
        self._original_predictions: Optional[Detections] = None
        self._object_prediction_list: list = []
        self.durations_in_seconds: dict[str, float] = {}
        if load_at_init:
            self.load_model()

    # --- contract -----------------------------------------------------
    @property
    def num_keypoints(self) -> int:
        return 5

    def load_model(self) -> None:
        raise NotImplementedError

    def unload_model(self) -> None:
        """Drop params (docs sahi/base.py:107)."""
        self.model = None
        self.variables = None
        self.__dict__.pop("_resident_vars", None)  # free device copies too
        self._forward_cache().cache_clear()

    def tile_forward(
        self, variables, tiles: jax.Array, conf_threshold: float
    ) -> Detections:
        """PURE traceable forward: tiles [T,S,S,3] float32 in [0,1] -> per-tile
        Detections (batched). Subclasses implement this; it is composed into
        larger fused jits by the prediction engine."""
        raise NotImplementedError

    def _forward_variant(self):
        """Hashable key for anything (beyond conf/shape) that changes the
        traced forward — e.g. the YOLO s2d fast-path toggle."""
        return None

    @functools.lru_cache(maxsize=None)
    def _jitted_forward(self, conf_threshold: float, variant=None):
        return jax.jit(
            lambda variables, tiles: self.tile_forward(variables, tiles, conf_threshold)
        )

    def forward_tiles(self, tiles: jax.Array, conf_threshold: float | None = None) -> Detections:
        """Jitted tile_forward, cached per (T, S) shape bucket."""
        from facedet_tpu.engine.predict import _resident_variables

        conf = self.confidence_threshold if conf_threshold is None else conf_threshold
        # device-committed weights (load_model inits under the CPU device;
        # passing CPU-committed params to an accelerator jit re-uploads the
        # whole tree every call — see predict._resident_variables)
        return self._jitted_forward(float(conf), self._forward_variant())(
            _resident_variables(self), tiles
        )

    def _forward_cache(self):
        return self._jitted_forward

    # --- host-side compatibility edge ---------------------------------
    def perform_inference(self, image: np.ndarray) -> None:
        """Single image/tile inference (docs sahi/base.py contract: stores raw
        predictions on self)."""
        t0 = time.perf_counter()
        img = np.asarray(image)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        size = self.image_size or max(img.shape[:2])
        spec = compute_letterbox(img.shape[0], img.shape[1], int(size))
        tile = apply_letterbox(jnp.asarray(img), spec)
        det = self.forward_tiles(tile[None])
        det = jax.tree.map(lambda x: x[0], det)
        det = Detections(
            boxes=unletterbox_boxes(det.boxes, spec),
            scores=det.scores,
            classes=det.classes,
            kpts=unletterbox_kpts(det.kpts, spec),
            valid=det.valid,
        )
        self._original_predictions = det
        self.durations_in_seconds["prediction"] = time.perf_counter() - t0

    @property
    def original_predictions(self) -> Optional[Detections]:
        return self._original_predictions

    def convert_original_predictions(
        self,
        shift_amount: tuple[int, int] = (0, 0),
        full_shape: Optional[tuple[int, int]] = None,
    ) -> None:
        """Raw tensor predictions -> shifted/clipped ObjectPrediction list
        (docs sahi/base.py:162)."""
        det = self._original_predictions
        if det is None:
            raise RuntimeError("perform_inference must be called first")
        sx, sy = float(shift_amount[0]), float(shift_amount[1])
        boxes = np.asarray(det.boxes) + np.array([sx, sy, sx, sy], np.float32)
        kpts = np.asarray(det.kpts).copy()
        kpts[..., 0] += sx
        kpts[..., 1] += sy
        valid = np.asarray(det.valid) & (np.asarray(det.scores) >= self.confidence_threshold)
        if full_shape is not None:
            h, w = full_shape
            boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, w)
            boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, h)
            valid &= (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
        shifted = Detections(
            boxes=jnp.asarray(boxes),
            scores=det.scores,
            classes=det.classes,
            kpts=jnp.asarray(kpts),
            valid=jnp.asarray(valid),
        )
        self._object_prediction_list = detections_to_object_predictions(
            shifted, self.category_mapping, full_shape
        )

    @property
    def object_prediction_list(self) -> list:
        return self._object_prediction_list

    @property
    def object_prediction_list_per_image(self) -> list[list]:
        return [self._object_prediction_list]


def attach_keypoints_to_predictions(predictions, keypoint_cache=None, iou_threshold=0.5):
    """API-compat shim for the reference's post-merge keypoint re-attachment
    (utils/yolo_wrapper.py:168-200: exact "x1_y1_x2_y2" string-key match, then
    IoU>0.5 fuzzy scan). In this framework keypoints ride through the merge as
    tensor columns, so predictions already carry them — the function exists so
    reference-call-sites port unchanged; it only fills gaps from an optional
    cache of {(x1, y1, x2, y2): kpts} for externally-produced predictions."""
    if not keypoint_cache:
        return predictions
    from facedet_tpu.eval.dual import calculate_iou

    for p in predictions:
        if p.keypoints is not None:
            continue
        box = tuple(round(v, 1) for v in p.bbox.to_xyxy())
        if box in keypoint_cache:
            p.keypoints = np.asarray(keypoint_cache[box], np.float32)
            continue
        x1, y1, x2, y2 = p.bbox.to_xyxy()
        for key, kpts in keypoint_cache.items():
            kx1, ky1, kx2, ky2 = key
            iou = calculate_iou(
                [x1, y1, x2 - x1, y2 - y1], [kx1, ky1, kx2 - kx1, ky2 - ky1]
            )
            if iou > iou_threshold:
                p.keypoints = np.asarray(kpts, np.float32)
                break
    return predictions


class YoloV11PoseDetectionModel(DetectionModel):
    """YOLOv11-pose detector (reference utils/yolo_wrapper.py:7-229), with
    keypoints carried natively through merge instead of the reference's
    string-key cache + IoU re-attach (:156-200)."""

    def attach_keypoints_to_predictions(self, predictions, iou_threshold=0.5):
        """Reference utils/yolo_wrapper.py:168 — a no-op pass-through here
        (keypoints survive the merge natively); kept for API parity."""
        return attach_keypoints_to_predictions(predictions, None, iou_threshold)

    def __init__(
        self,
        *args,
        scale: str = "s",
        dtype: str = "bfloat16",
        bn_dtype: str | None = None,
        s2d_early: bool = True,
        **kwargs,
    ):
        self.scale = scale
        self.dtype = dtype
        # BatchNorm/activation compute dtype. Default follows the conv dtype:
        # bf16 serving keeps inter-layer activations at 2 bytes (BN is a
        # folded affine at inference; measured ~9% faster forward, boxes
        # within 1px / scores within 0.02 of f32 BN on the golden checkpoint).
        # Eval tools that produce committed artifacts pin "float32".
        if bn_dtype is None:
            bn_dtype = "bfloat16" if dtype == "bfloat16" else "float32"
        self.bn_dtype = bn_dtype
        # Exact space-to-depth rewrite of stem/down1/c3k2_0 (models/yolo_s2d.py):
        # same math, ~2.5x faster early backbone on TPU (lane-padding economics).
        self.s2d_early = s2d_early
        super().__init__(*args, **kwargs)

    def load_model(self) -> None:
        from facedet_tpu.models.yolov11 import YoloConfig, YoloV11

        self.cfg = YoloConfig(
            scale=self.scale,
            num_classes=len(self.category_mapping),
            with_pose=True,
            dtype=self.dtype,
            bn_dtype=self.bn_dtype,
        )
        self.model = YoloV11(self.cfg)
        if self.model_path is None:
            init_size = int(self.image_size or 640)
            # init on CPU: tracing/compiling the init graph on a remote TPU
            # costs minutes; params transfer to the accelerator on first use
            with jax.default_device(jax.local_devices(backend="cpu")[0]):
                self.variables = self.model.init(
                    jax.random.PRNGKey(0),
                    jnp.zeros((1, 64, 64, 3), jnp.float32),
                    train=False,
                )
        elif str(self.model_path).endswith(".npz"):
            self.variables = load_params_npz(self.model_path)
        elif str(self.model_path).endswith(".pt"):
            from facedet_tpu.models.convert import convert_ultralytics_checkpoint

            self.variables, detected_scale = convert_ultralytics_checkpoint(
                self.model_path, self.cfg
            )
        else:
            raise ValueError(f"unsupported checkpoint format: {self.model_path}")

    def _forward_variant(self):
        return bool(self.s2d_early)

    def tile_forward(self, variables, tiles, conf_threshold: float) -> Detections:
        from facedet_tpu.models.yolo_decode import (
            decode_predictions,
            decode_to_detections,
        )

        h, w = tiles.shape[1], tiles.shape[2]
        if self.s2d_early and h % 4 == 0 and w % 4 == 0 and "batch_stats" in variables:
            from facedet_tpu.models.yolo_s2d import s2d_early_forward

            early = s2d_early_forward(variables, tiles, self.cfg)
            outs = self.model.apply(variables, early, train=False, from_early=True)
        else:
            outs = self.model.apply(variables, tiles, train=False)
        preds = decode_predictions(outs)
        return decode_to_detections(
            preds,
            conf_threshold=conf_threshold,
            max_detections=self.max_detections_per_tile,
            nms_iou=0.7,
            class_agnostic=True,
        )
