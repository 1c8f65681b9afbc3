"""On-device greedy NMS / NMM / GreedyNMM merge.

TPU-native replacement for SAHI's CPU postprocess classes
(POSTPROCESS_NAME_TO_CLASS — docs sahi/predict.py:44-49, invoked at
:254-259,316-320), which walk Python ``ObjectPrediction`` lists with
shapely-backed geometry. Keypoints ride through as columns, eliminating the
reference's post-merge fuzzy-IoU keypoint re-attachment
(utils/yolo_wrapper.py:168-200).

Algorithm: greedy NMS ("keep i iff no kept j with higher score matches i") is
the unique fixpoint of a dominance recursion. Instead of an O(N) sequential
loop — pathological on TPU — we solve it by Jacobi iteration: each round is
one [N,N]x[N] masked matvec (MXU work), and the iterate is exact for every box
whose suppression-chain depth <= round. A ``lax.while_loop`` runs until
fixpoint (bounded by N, typically ~5 rounds). Group membership for NMM box
merging (union bbox per keeper, matching ``sahi.postprocess.combine``
greedy_nmm semantics: match sets formed in score order against original
coordinates, keeper's score/class/keypoints kept) is then a single masked
min/max reduction.

  * metric ∈ {IOU, IOS}; ``class_agnostic`` gates same-class matching
    (utils/tuning_sahi.py:106 uses class-agnostic for single-class faces).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from facedet_tpu.core.boxes import pair_metric_matrix
from facedet_tpu.core.detections import Detections

__all__ = ["merge_detections", "nms", "greedy_keep_mask", "POSTPROCESS_TYPES"]

POSTPROCESS_TYPES = ("NMS", "NMM", "GREEDYNMM", "LSNMS")
# LSNMS in the reference (docs sahi/predict.py:44-49) is lsnms's grid-sparse
# NMS — a CPU locality optimisation with NMS semantics. On TPU the dense
# fixpoint matvec already runs in O(100us), so LSNMS is an alias for NMS.
_MODE_ALIASES = {"LSNMS": "NMS"}


def greedy_keep_mask(match: jax.Array, valid: jax.Array) -> jax.Array:
    """Exact greedy-NMS keep mask via fixpoint iteration.

    match: [N, N] bool, True where row i (higher score, i < j enforced by the
    caller via upper-triangular masking) suppresses column j.
    valid: [N] bool. Returns kept [N] bool."""
    matchf = match.astype(jnp.float32)

    def body(state):
        kept, _ = state
        suppressed = (matchf.T @ kept.astype(jnp.float32)) > 0.0
        new_kept = valid & ~suppressed
        changed = jnp.any(new_kept != kept)
        return new_kept, changed

    def cond(state):
        return state[1]

    kept, _ = jax.lax.while_loop(cond, body, (valid, jnp.array(True)))
    return kept


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
    mode = _MODE_ALIASES.get(mode, mode)
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

    kept = greedy_keep_mask(match, det.valid)
    boxes = det.boxes

    if merge_boxes:
        # member[i, j]: suppressed box j belongs to keeper i's group — the
        # FIRST (highest-score) kept row matching it, per greedy semantics.
        cand = match & kept[:, None] & ~kept[None, :]
        idx = jnp.arange(n)
        first_keeper = jnp.min(
            jnp.where(cand, idx[:, None], n), axis=0
        )  # [N] keeper index per suppressed box (n = none)
        member = (first_keeper[None, :] == idx[:, None]) & cand
        group = member | (jnp.eye(n, dtype=bool) & kept[:, None])
        gx1y1 = jnp.min(
            jnp.where(group[..., None], boxes[None, :, :2], jnp.inf), axis=1
        )
        gx2y2 = jnp.max(
            jnp.where(group[..., None], boxes[None, :, 2:], -jnp.inf), axis=1
        )
        merged = jnp.concatenate([gx1y1, gx2y2], axis=-1)
        boxes = jnp.where(kept[:, None], merged, boxes)

    return Detections(
        boxes=boxes,
        scores=det.scores,
        classes=det.classes,
        kpts=det.kpts,
        valid=kept,
    )


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
