"""On-device crop-and-resize (ROI extraction) for the detect->crop->enhance
fusion.

The reference's pipeline v1 writes every face crop to disk and re-reads it for
enhancement (pipeline_v1_detection_first/app_v1.py:88-106 ->
utils/enhancer.py:344-391). Here variable-size boxes are extracted from the
image and resampled to one static ``[N, S, S, 3]`` batch on device
(scale_and_translate with traced per-box scale/offset — no dynamic shapes), so
detection, cropping and SR chain inside a single jit without any host
round-trip (SURVEY.md §7 "fusing the crop->enhance->(re-detect) loop").
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["crop_and_resize", "paste_resized_crops"]


@functools.partial(jax.jit, static_argnames=("out_size",))
def crop_and_resize(
    image: jax.Array,
    boxes: jax.Array,
    out_size: int = 128,
    margin: float = 0.0,
) -> jax.Array:
    """image [H,W,3] float; boxes [N,4] xyxy -> crops [N,out_size,out_size,3].

    Each box (optionally expanded by ``margin`` * max side) is resampled to the
    static output square with aspect preserved: the square window covers the
    box's max side from its top-left corner, so non-square boxes include the
    adjoining image context (zeros only beyond image bounds) instead of black
    letterbox bars — better SR input than hard-cropped bars."""

    def one(box):
        x1, y1, x2, y2 = box
        side = jnp.maximum(jnp.maximum(x2 - x1, y2 - y1), 1.0)
        pad = margin * side
        x1, y1 = x1 - pad, y1 - pad
        w = jnp.maximum(x2 + pad - x1, 1.0)
        h = jnp.maximum(y2 + pad - y1, 1.0)
        scale = out_size / jnp.maximum(w, h)
        return jax.image.scale_and_translate(
            image,
            (out_size, out_size, image.shape[2]),
            (0, 1),
            jnp.stack([scale, scale]),
            jnp.stack([-y1 * scale, -x1 * scale]),
            method="linear",
        )

    return jax.vmap(one)(boxes.astype(jnp.float32))


def paste_resized_crops(crops: jax.Array, boxes: jax.Array, out_hw: tuple[int, int]):
    """Host-side helper: place enhanced square crops back at their (scaled) box
    positions on a canvas — for visual composites; returns numpy uint8."""
    import numpy as np

    h, w = out_hw
    canvas = np.zeros((h, w, 3), np.float32)
    crops_np = np.asarray(crops)
    boxes_np = np.asarray(boxes)
    for crop, box in zip(crops_np, boxes_np):
        x1, y1, x2, y2 = (int(round(v)) for v in box)
        x1, y1 = max(0, x1), max(0, y1)
        x2, y2 = min(w, x2), min(h, y2)
        if x2 <= x1 or y2 <= y1:
            continue
        import jax.image as jimage

        resized = np.asarray(
            jimage.resize(jnp.asarray(crop), (y2 - y1, x2 - x1, 3), "linear")
        )
        canvas[y1:y2, x1:x2] = resized
    return (canvas.clip(0, 1) * 255).astype(np.uint8)
