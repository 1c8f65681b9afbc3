"""Pure-JAX box geometry.

TPU-native replacement for the reference's box math, which is scattered across
shapely/GEOS (SAHI postprocess geometry), the Cython ``bbox_overlaps`` extension
(reference: eval/eval_official_widerface.py:20-33) and ad-hoc numpy in the
wrappers (reference: utils/yolo_wrapper.py:84-166). Everything here is a pure
function over ``[..., 4]`` float tensors in **xyxy** order, jit/vmap friendly,
and static-shape safe.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "xyxy_to_xywh",
    "xywh_to_xyxy",
    "xyxy_to_cxcywh",
    "cxcywh_to_xyxy",
    "box_area",
    "intersection_matrix",
    "iou_matrix",
    "ios_matrix",
    "pair_metric_matrix",
    "clip_boxes",
    "shift_boxes",
    "scale_boxes",
    "union_boxes",
]


def xyxy_to_xywh(boxes: jax.Array) -> jax.Array:
    """[x1,y1,x2,y2] -> [x,y,w,h] (top-left + size, COCO convention)."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([x1, y1, x2 - x1, y2 - y1], axis=-1)


def xywh_to_xyxy(boxes: jax.Array) -> jax.Array:
    x, y, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([x, y, x + w, y + h], axis=-1)


def xyxy_to_cxcywh(boxes: jax.Array) -> jax.Array:
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], axis=-1
    )


def cxcywh_to_xyxy(boxes: jax.Array) -> jax.Array:
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    hw, hh = w * 0.5, h * 0.5
    return jnp.concatenate([cx - hw, cy - hh, cx + hw, cy + hh], axis=-1)


def box_area(boxes: jax.Array) -> jax.Array:
    """Area of xyxy boxes; negative extents clamp to zero."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


def intersection_matrix(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise intersection areas: a [N,4], b [M,4] -> [N,M]."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])  # [N,M,2]
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])  # [N,M,2]
    wh = jnp.maximum(rb - lt, 0.0)
    return wh[..., 0] * wh[..., 1]


def iou_matrix(a: jax.Array, b: jax.Array, eps: float = 1e-9) -> jax.Array:
    """Pairwise IoU. Vectorized replacement for the reference's Cython
    ``bbox_overlaps`` (eval/eval_official_widerface.py:24-33)."""
    inter = intersection_matrix(a, b)
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return inter / jnp.maximum(union, eps)


def ios_matrix(a: jax.Array, b: jax.Array, eps: float = 1e-9) -> jax.Array:
    """Pairwise intersection-over-smaller-area (SAHI's IOS match metric)."""
    inter = intersection_matrix(a, b)
    smaller = jnp.minimum(box_area(a)[:, None], box_area(b)[None, :])
    return inter / jnp.maximum(smaller, eps)


def pair_metric_matrix(a: jax.Array, b: jax.Array, metric: str) -> jax.Array:
    """Dispatch on the SAHI match metric name ('IOU' | 'IOS')."""
    metric = metric.upper()
    if metric == "IOU":
        return iou_matrix(a, b)
    if metric == "IOS":
        return ios_matrix(a, b)
    raise ValueError(f"unknown match metric: {metric!r} (expected IOU or IOS)")


def clip_boxes(boxes: jax.Array, height: jax.Array, width: jax.Array) -> jax.Array:
    """Clamp xyxy boxes into [0,width]x[0,height] (reference clamps e.g. at
    docs sahi/retinaface_sahi.py:153-154)."""
    x1 = jnp.clip(boxes[..., 0], 0, width)
    y1 = jnp.clip(boxes[..., 1], 0, height)
    x2 = jnp.clip(boxes[..., 2], 0, width)
    y2 = jnp.clip(boxes[..., 3], 0, height)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def shift_boxes(boxes: jax.Array, shift_x: jax.Array, shift_y: jax.Array) -> jax.Array:
    """Slice-local -> global coordinates (the
    ``get_shifted_object_prediction`` of docs sahi/prediction.py:94, as tensor math)."""
    offset = jnp.stack(
        [
            jnp.asarray(shift_x, boxes.dtype),
            jnp.asarray(shift_y, boxes.dtype),
            jnp.asarray(shift_x, boxes.dtype),
            jnp.asarray(shift_y, boxes.dtype),
        ],
        axis=-1,
    )
    return boxes + offset


def scale_boxes(boxes: jax.Array, scale: jax.Array) -> jax.Array:
    """Divide-by-scale mapping used by enhance-first pipelines
    (reference: pipeline_v2_enhancement_first/app_v2.py:131-154)."""
    return boxes * jnp.asarray(scale, boxes.dtype)


def union_boxes(a: jax.Array, b: jax.Array) -> jax.Array:
    """Smallest box covering both — SAHI's NMM merge of a matched pair."""
    return jnp.concatenate(
        [jnp.minimum(a[..., :2], b[..., :2]), jnp.maximum(a[..., 2:], b[..., 2:])],
        axis=-1,
    )
