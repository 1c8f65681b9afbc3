"""Matplotlib visualizer — the reference's second (legacy) viz path.

Reference: docs sahi/visualization.py:11-143 — ``FaceVisualizer`` drawing
detections via matplotlib patches into an RGB array (:17-68), crop saving
(:71) and a text summary (:106), duplicating utils/visualization.py. Kept as a
distinct class for parity; gated on matplotlib.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


class FaceVisualizer:
    def __init__(self, box_color: str = "red", text_color: str = "white"):
        self.box_color = box_color
        self.text_color = text_color

    def draw_detections(
        self, image: np.ndarray, predictions: Sequence, title: Optional[str] = None
    ) -> np.ndarray:
        """Array -> annotated RGB array via matplotlib patches
        (docs sahi/visualization.py:17-68)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.patches as patches
        import matplotlib.pyplot as plt

        h, w = image.shape[:2]
        dpi = 100
        fig, ax = plt.subplots(figsize=(w / dpi, h / dpi), dpi=dpi)
        ax.imshow(image)
        ax.axis("off")
        for p in predictions:
            x1, y1, x2, y2 = p.bbox.to_xyxy()
            ax.add_patch(
                patches.Rectangle(
                    (x1, y1), x2 - x1, y2 - y1, fill=False, edgecolor=self.box_color, lw=2
                )
            )
            ax.text(
                x1,
                max(0, y1 - 4),
                f"{p.category.name} {p.score.value:.2f}",
                color=self.text_color,
                fontsize=8,
                bbox=dict(facecolor=self.box_color, alpha=0.6, pad=1),
            )
        if title:
            ax.set_title(title)
        fig.subplots_adjust(left=0, right=1, top=1, bottom=0)
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
        plt.close(fig)
        return buf

    def save_face_crops(
        self, image: np.ndarray, predictions: Sequence, output_dir: str, prefix: str = "face"
    ) -> list[str]:
        """(docs sahi/visualization.py:71) — delegates to the PIL implementation."""
        from facedet_tpu.utils.viz import save_face_crops

        return save_face_crops(image, predictions, output_dir, prefix=prefix)

    def create_detection_summary(
        self, predictions: Sequence, image_name: str = "", output_path: Optional[str] = None
    ) -> str:
        """(docs sahi/visualization.py:106) — delegates to the text reporter."""
        from facedet_tpu.utils.viz import create_detection_summary

        return create_detection_summary(predictions, image_name, output_path)
