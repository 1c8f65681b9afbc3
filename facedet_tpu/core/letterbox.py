"""Aspect-preserving resize + pad (letterbox) and its inverse box mapping.

The reference delegates letterboxing to ultralytics' predictor
(utils/yolo_wrapper.py:74-80, imgsz argument). Here it is explicit: the
geometry is computed on host (static per image-shape bucket) and the pixel
resize runs on device with ``jax.image.resize``.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = ["LetterboxSpec", "compute_letterbox", "apply_letterbox", "unletterbox_boxes"]


@dataclasses.dataclass(frozen=True)
class LetterboxSpec:
    src_h: int
    src_w: int
    dst: int  # square target
    new_h: int
    new_w: int
    pad_top: int
    pad_left: int
    scale: float


def compute_letterbox(src_h: int, src_w: int, dst: int) -> LetterboxSpec:
    scale = min(dst / src_h, dst / src_w)
    new_h = min(dst, max(1, round(src_h * scale)))
    new_w = min(dst, max(1, round(src_w * scale)))
    pad_top = (dst - new_h) // 2
    pad_left = (dst - new_w) // 2
    return LetterboxSpec(src_h, src_w, dst, new_h, new_w, pad_top, pad_left, scale)


def apply_letterbox(image: jax.Array, spec: LetterboxSpec, pad_value: float = 114 / 255) -> jax.Array:
    """image [H,W,3] float in [0,1] -> [dst,dst,3]."""
    resized = jax.image.resize(image, (spec.new_h, spec.new_w, image.shape[2]), "bilinear")
    return jnp.pad(
        resized,
        (
            (spec.pad_top, spec.dst - spec.new_h - spec.pad_top),
            (spec.pad_left, spec.dst - spec.new_w - spec.pad_left),
            (0, 0),
        ),
        constant_values=pad_value,
    )


def unletterbox_boxes(boxes: jax.Array, spec: LetterboxSpec) -> jax.Array:
    """Map xyxy boxes from letterboxed coords back to source-image coords."""
    offset = jnp.array(
        [spec.pad_left, spec.pad_top, spec.pad_left, spec.pad_top], boxes.dtype
    )
    return (boxes - offset) / spec.scale


def unletterbox_kpts(kpts: jax.Array, spec: LetterboxSpec) -> jax.Array:
    """kpts [..., 3] (x, y, v) letterboxed -> source coords."""
    x = (kpts[..., 0] - spec.pad_left) / spec.scale
    y = (kpts[..., 1] - spec.pad_top) / spec.scale
    return jnp.stack([x, y, kpts[..., 2]], axis=-1)
