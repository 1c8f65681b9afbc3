"""Miscellaneous tools: device probe, training-curve plot, detector validate.

Reference parity for the misc scripts (SURVEY.md §2 last rows):
  * scripts/check_cuda.py (9 LoC device probe) -> ``check_devices``
  * scripts/result_png.py (ultralytics plot_results) -> ``plot_results``
  * pipeline_v3_RTDETR/train_rtdetr.py:228-241 ``validate_model`` ->
    ``validate_detector`` (COCO mAP over a val set)
"""
from __future__ import annotations

import csv
import os
from typing import Callable, Optional

import numpy as np


def check_devices() -> dict:
    """Device probe (reference scripts/check_cuda.py)."""
    import jax

    devices = jax.devices()
    return {
        "backend": jax.default_backend(),
        "num_devices": len(devices),
        "devices": [f"{d.platform}:{d.id} ({d.device_kind})" for d in devices],
    }


def plot_results(results_csv: str, output_png: Optional[str] = None) -> Optional[str]:
    """Training-curve PNG from a results.csv (reference scripts/result_png.py
    via ultralytics plot_results); gated on matplotlib."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:  # pragma: no cover
        return None
    with open(results_csv) as f:
        rows = list(csv.DictReader(f))
    if not rows:
        return None
    keys = [k for k in rows[0] if k != "epoch"]
    epochs = [float(r["epoch"]) for r in rows]
    fig, ax = plt.subplots(figsize=(8, 5))
    for k in keys:
        ax.plot(epochs, [float(r[k]) for r in rows], label=k)
    ax.set_xlabel("epoch")
    ax.legend()
    ax.grid(alpha=0.3)
    out = output_png or os.path.splitext(results_csv)[0] + ".png"
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


def validate_detector(
    detection_model,
    dataset: list[dict],
    image_loader: Callable[[str], np.ndarray],
    use_sahi: bool = False,
    slice_size: int = 640,
    overlap: float = 0.2,
    perform_standard_pred: bool = True,
) -> dict:
    """COCO mAP validation over {file_name, image_id, gt: [[x,y,w,h],...]}
    items (reference train_rtdetr.py:228-241 validate_model)."""
    from facedet_tpu.engine.predict import get_prediction, get_sliced_prediction
    from facedet_tpu.eval.coco_map import coco_map

    preds, gts = [], []
    for item in dataset:
        for g in item["gt"]:
            gts.append({"image_id": item["image_id"], "bbox": list(g)})
        img = image_loader(item["file_name"])
        if use_sahi:
            result = get_sliced_prediction(
                img,
                detection_model,
                slice_height=slice_size,
                slice_width=slice_size,
                overlap_height_ratio=overlap,
                overlap_width_ratio=overlap,
                perform_standard_pred=perform_standard_pred,
                postprocess_class_agnostic=True,
            )
        else:
            result = get_prediction(img, detection_model)
        preds.extend(result.to_coco_predictions(image_id=item["image_id"]))
    return coco_map(preds, gts)
