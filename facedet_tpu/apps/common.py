"""Shared CLI plumbing for the pipeline apps."""
from __future__ import annotations

import argparse
import os

from facedet_tpu.utils.config import DetectorConfig, EnhancerConfig


def build_detector(cfg: DetectorConfig):
    if cfg.family == "fake":
        # deterministic blob detector (engine/fake.py) — lets every CLI and
        # evaluator run end-to-end without weights (tests, smoke checks)
        from facedet_tpu.engine.fake import FakeBlobDetectionModel

        return FakeBlobDetectionModel(
            confidence_threshold=cfg.confidence_threshold,
            image_size=cfg.image_size,
        )
    if cfg.family == "yolov11":
        from facedet_tpu.engine.detector import YoloV11PoseDetectionModel

        return YoloV11PoseDetectionModel(
            model_path=cfg.model_path,
            scale=cfg.scale,
            dtype=cfg.dtype,
            confidence_threshold=cfg.confidence_threshold,
            image_size=cfg.image_size,
            max_detections_per_tile=cfg.max_detections_per_tile,
        )
    if cfg.family == "scrfd":
        from facedet_tpu.engine.scrfd_wrapper import ScrfdDetectionModel

        return ScrfdDetectionModel(
            model_path=cfg.model_path,
            confidence_threshold=cfg.confidence_threshold,
            image_size=cfg.image_size,
            dtype=cfg.dtype,
        )
    if cfg.family == "rtdetr":
        from facedet_tpu.engine.rtdetr_wrapper import RtDetrDetectionModel

        return RtDetrDetectionModel(
            model_path=cfg.model_path,
            confidence_threshold=cfg.confidence_threshold,
            image_size=cfg.image_size,
            dtype=cfg.dtype,
        )
    if cfg.family == "onnx":
        # any exported ultralytics YOLO/RT-DETR .onnx (engine/onnx_wrapper.py)
        from facedet_tpu.engine.onnx_wrapper import OnnxDetectionModel

        return OnnxDetectionModel(
            model_path=cfg.model_path,
            confidence_threshold=cfg.confidence_threshold,
            image_size=cfg.image_size,
            max_detections_per_tile=cfg.max_detections_per_tile,
        )
    raise ValueError(f"unknown detector family {cfg.family!r}")


def build_enhancer(cfg: EnhancerConfig):
    from facedet_tpu.engine.enhancer import FaceEnhancer

    return FaceEnhancer(
        model_name=cfg.model_name,
        model_path=cfg.model_path,
        outscale=cfg.outscale,
        tile=cfg.tile,
        tile_pad=cfg.tile_pad,
        half=cfg.half,
    )


def base_parser(description: str) -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=description)
    ap.add_argument("--input", default="data/input", help="image file or folder")
    ap.add_argument("--output", default="data/output")
    ap.add_argument("--model-path", default=None, help=".npz / .pt checkpoint")
    ap.add_argument(
        "--family", default="yolov11",
        choices=["yolov11", "scrfd", "rtdetr", "onnx", "fake"]
    )
    ap.add_argument("--scale", default="s", help="yolo model scale n/s/m/l/x")
    ap.add_argument("--conf", type=float, default=0.3)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--slice", type=int, default=640)
    ap.add_argument("--overlap", type=float, default=0.2)
    ap.add_argument("--config", default=None, help="PipelineConfig json path")
    ap.add_argument(
        "--ingest", default="rgb",
        choices=["rgb", "yuv420", "dct420", "dct420s"],
        help="upload format: rgb (3 B/px), yuv420 planes (1.5 B/px, native "
        "raw-data decode), dct420 (the file's quantized DCT coefficients "
        "— no host IDCT, lossless for 4:2:0 JPEGs), or dct420s (same "
        "coefficients as a sparse bitmap + packed values: ~3-4x fewer wire "
        "bytes; BENCH.md ingest study)",
    )
    return ap


def list_inputs(path: str) -> list[str]:
    """Resolve an image file or folder; fail fast with a clean message BEFORE
    any model loads (model init costs ~a minute on a remote TPU)."""
    exts = (".jpg", ".jpeg", ".png", ".bmp", ".webp")
    if os.path.isfile(path):
        return [path]
    if not os.path.isdir(path):
        raise SystemExit(f"error: input path does not exist: {path}")
    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.lower().endswith(exts)
    )
    if not files:
        raise SystemExit(f"error: no images found in {path}")
    return files
