"""Model setup: weight acquisition hooks + synthetic sample images + load
smoke test.

Reference: utils/download_models.py:8-67 — auto-download InsightFace models
with a post-download smoke inference on a random image (:16-25) and synthetic
sample-image generation (:30-53). TPU build hosts are zero-egress, so
downloads are explicit hooks: checkpoints are converted offline
(models/convert.py) and loaded from paths; missing weights raise with
actionable instructions instead of silently fetching.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

WEIGHT_SOURCES = {
    "yolo11s-pose": "ultralytics release asset yolo11s-pose.pt -> convert with facedet_tpu.models.convert.convert_ultralytics_checkpoint",
    "RealESRGAN_x4plus": "xinntao/Real-ESRGAN release RealESRGAN_x4plus.pth -> convert_rrdbnet_checkpoint",
    "RealESRGAN_x2plus": "xinntao/Real-ESRGAN release RealESRGAN_x2plus.pth -> convert_rrdbnet_checkpoint",
    "scrfd_2.5g": "insightface model zoo scrfd_2.5g_bnkps -> (onnx; retrain or port offline)",
}


def ensure_weights(name: str, path: Optional[str]) -> Optional[str]:
    """Return the path if it exists; otherwise raise with conversion
    instructions (no network egress on TPU hosts)."""
    if path is None:
        return None  # random init — valid for tests/benchmarks
    if os.path.exists(path):
        return path
    hint = WEIGHT_SOURCES.get(name, "obtain the torch checkpoint and convert offline")
    raise FileNotFoundError(
        f"weights for {name!r} not found at {path}. This host has no network "
        f"egress; acquire and convert offline: {hint}"
    )


def generate_sample_images(output_dir: str, n: int = 3, size=(480, 640), seed: int = 0) -> list[str]:
    """Synthetic sample images with face-like bright ellipses on textured
    background (reference utils/download_models.py:30-53)."""
    from facedet_tpu.utils.viz import save_image

    os.makedirs(output_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    paths = []
    h, w = size
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(n):
        img = rng.integers(40, 90, (h, w, 3)).astype(np.float32)
        my, mx = min(60, h // 3), min(60, w // 3)
        for _ in range(rng.integers(2, 6)):
            cy, cx = rng.integers(my, h - my), rng.integers(mx, w - mx)
            ry, rx = rng.integers(18, 40), rng.integers(14, 30)
            mask = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
            skin = rng.integers(150, 230, (3,))
            img[mask] = skin
            # eyes
            for ex in (-rx // 3, rx // 3):
                em = ((yy - (cy - ry // 4)) ** 2 + (xx - (cx + ex)) ** 2) <= 9
                img[em] = 30
        path = os.path.join(output_dir, f"sample_{i}.jpg")
        save_image(path, img.clip(0, 255).astype(np.uint8))
        paths.append(path)
    return paths


def smoke_test_model(detection_model, size=(480, 640)) -> bool:
    """Post-load smoke inference on a random image
    (reference utils/download_models.py:22-25)."""
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (*size, 3), dtype=np.uint8)
    detection_model.perform_inference(img)
    return detection_model.original_predictions is not None
