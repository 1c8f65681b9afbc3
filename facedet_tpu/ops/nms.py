"""On-device greedy NMS / NMM / GreedyNMM merge.

TPU-native replacement for SAHI's CPU postprocess classes
(POSTPROCESS_NAME_TO_CLASS — docs sahi/predict.py:44-49, invoked at
:254-259,316-320), which walk Python ``ObjectPrediction`` lists with
shapely-backed geometry. Here the merge is a single ``lax.fori_loop`` over a
precomputed ``[N, N]`` match matrix on fixed-capacity ``Detections``; keypoints
ride through as columns, eliminating the reference's post-merge fuzzy-IoU
keypoint re-attachment (utils/yolo_wrapper.py:168-200).

Semantics:
  * NMS        — keep highest-score box of every matched group, drop the rest.
  * NMM / GREEDYNMM — merge each matched group into its keeper: union bbox,
    keeper's score/class/keypoints (sahi merges pairs by bbox-union and keeps
    the higher score — the keeper, since groups are formed in score order).
    Match sets are formed greedily in descending score order against original
    (pre-merge) coordinates, matching ``sahi.postprocess.combine.greedy_nmm``.
  * metric ∈ {IOU, IOS}; ``class_agnostic`` gates same-class matching
    (utils/tuning_sahi.py:106 uses class-agnostic for single-class faces).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from facedet_tpu.core.boxes import pair_metric_matrix
from facedet_tpu.core.detections import Detections

__all__ = ["merge_detections", "nms", "POSTPROCESS_TYPES"]

POSTPROCESS_TYPES = ("NMS", "NMM", "GREEDYNMM")


@functools.partial(
    jax.jit, static_argnames=("mode", "match_metric", "class_agnostic")
)
def merge_detections(
    det: Detections,
    mode: str = "GREEDYNMM",
    match_metric: str = "IOS",
    match_threshold: float = 0.5,
    class_agnostic: bool = True,
) -> Detections:
    """Greedy merge over a fixed-capacity ``Detections``. Returns detections
    sorted by descending score with suppressed rows masked invalid."""
    mode = mode.upper()
    if mode not in POSTPROCESS_TYPES:
        raise ValueError(f"unknown postprocess {mode!r}; expected {POSTPROCESS_TYPES}")
    merge_boxes = mode in ("NMM", "GREEDYNMM")

    det = det.sort_by_score()
    n = det.capacity
    metric = pair_metric_matrix(det.boxes, det.boxes, match_metric)  # [N,N]
    match = metric > match_threshold
    if not class_agnostic:
        match &= det.classes[:, None] == det.classes[None, :]
    # only lower-scored (later) rows can be suppressed/merged into row i
    tri = jnp.arange(n)[None, :] > jnp.arange(n)[:, None]
    match &= tri & det.valid[None, :] & det.valid[:, None]

    def body(i, state):
        alive, boxes = state
        row = match[i] & alive & alive[i]  # group members for keeper i
        if merge_boxes:
            any_sel = row[:, None]
            x1y1 = jnp.min(jnp.where(any_sel, boxes[:, :2], jnp.inf), axis=0)
            x2y2 = jnp.max(jnp.where(any_sel, boxes[:, 2:], -jnp.inf), axis=0)
            merged = jnp.concatenate(
                [jnp.minimum(x1y1, boxes[i, :2]), jnp.maximum(x2y2, boxes[i, 2:])]
            )
            keep_any = alive[i] & jnp.any(row)
            boxes = boxes.at[i].set(jnp.where(keep_any, merged, boxes[i]))
        alive = alive & ~row
        return alive, boxes

    alive, boxes = jax.lax.fori_loop(0, n, body, (det.valid, det.boxes))
    out = Detections(
        boxes=boxes,
        scores=det.scores,
        classes=det.classes,
        kpts=det.kpts,
        valid=alive,
    )
    return out


def nms(
    det: Detections,
    iou_threshold: float = 0.7,
    class_agnostic: bool = True,
) -> Detections:
    """Plain IoU NMS (the per-tile in-model NMS the reference delegates to
    ultralytics' predictor, utils/yolo_wrapper.py:74-80)."""
    return merge_detections(
        det,
        mode="NMS",
        match_metric="IOU",
        match_threshold=iou_threshold,
        class_agnostic=class_agnostic,
    )
