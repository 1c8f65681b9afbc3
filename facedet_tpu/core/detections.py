"""Fixed-capacity detection tensors — the on-device data model.

The reference keeps detections as Python object graphs
(``ObjectPrediction`` lists, docs sahi/prediction.py:44) and loses keypoints at
merge time, re-attaching them with a string-key + fuzzy-IoU cache
(utils/yolo_wrapper.py:156-200). Here detections live as a registered-pytree
struct of fixed-capacity arrays with a validity mask, so the whole
slice→shift→merge pipeline stays on device under one ``jit`` and keypoints ride
along as columns. ``ObjectPrediction`` objects exist only at the API edge
(facedet_tpu.engine.prediction).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

NUM_FACE_KEYPOINTS = 5  # left_eye, right_eye, nose, left_mouth, right_mouth


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["boxes", "scores", "classes", "kpts", "valid"],
    meta_fields=[],
)
@dataclasses.dataclass
class Detections:
    """A fixed-capacity batch of detections.

    boxes:   [N, 4] float32, xyxy, global coordinates unless noted
    scores:  [N]    float32
    classes: [N]    int32
    kpts:    [N, K, 3] float32 (x, y, visibility/conf)
    valid:   [N]    bool — rows beyond the live count are padding
    """

    boxes: jax.Array
    scores: jax.Array
    classes: jax.Array
    kpts: jax.Array
    valid: jax.Array

    @property
    def capacity(self) -> int:
        return self.boxes.shape[-2]

    @property
    def num_keypoints(self) -> int:
        return self.kpts.shape[-2]

    def count(self) -> jax.Array:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)

    @staticmethod
    def empty(capacity: int, num_keypoints: int = NUM_FACE_KEYPOINTS) -> "Detections":
        return Detections(
            boxes=jnp.zeros((capacity, 4), jnp.float32),
            scores=jnp.zeros((capacity,), jnp.float32),
            classes=jnp.zeros((capacity,), jnp.int32),
            kpts=jnp.zeros((capacity, num_keypoints, 3), jnp.float32),
            valid=jnp.zeros((capacity,), bool),
        )

    @staticmethod
    def from_arrays(
        boxes,
        scores,
        classes=None,
        kpts=None,
        capacity: int | None = None,
        num_keypoints: int = NUM_FACE_KEYPOINTS,
    ) -> "Detections":
        """Build from concrete arrays (host-side edge; pads/truncates to capacity)."""
        boxes = jnp.asarray(boxes, jnp.float32).reshape(-1, 4)
        n = boxes.shape[0]
        scores = jnp.asarray(scores, jnp.float32).reshape(-1)
        classes = (
            jnp.zeros((n,), jnp.int32)
            if classes is None
            else jnp.asarray(classes, jnp.int32).reshape(-1)
        )
        if kpts is None:
            kpts = jnp.zeros((n, num_keypoints, 3), jnp.float32)
        else:
            kpts = jnp.asarray(kpts, jnp.float32).reshape(n, -1, 3)
        cap = capacity if capacity is not None else max(n, 1)
        det = Detections(
            boxes=jnp.zeros((cap, 4), jnp.float32).at[: min(n, cap)].set(boxes[:cap]),
            scores=jnp.zeros((cap,), jnp.float32).at[: min(n, cap)].set(scores[:cap]),
            classes=jnp.zeros((cap,), jnp.int32).at[: min(n, cap)].set(classes[:cap]),
            kpts=jnp.zeros((cap, kpts.shape[1], 3), jnp.float32)
            .at[: min(n, cap)]
            .set(kpts[:cap]),
            valid=jnp.arange(cap) < n,
        )
        return det

    def sort_by_score(self) -> "Detections":
        """Descending score order; invalid rows sink to the end."""
        key = jnp.where(self.valid, self.scores, -jnp.inf)
        order = jnp.argsort(-key)
        return self.take(order)

    def take(self, idx: jax.Array) -> "Detections":
        return Detections(
            boxes=self.boxes[idx],
            scores=self.scores[idx],
            classes=self.classes[idx],
            kpts=self.kpts[idx],
            valid=self.valid[idx],
        )

    def mask(self, keep: jax.Array) -> "Detections":
        """AND the validity mask with ``keep`` (no compaction needed on device)."""
        return dataclasses.replace(self, valid=self.valid & keep)

    def filter_score(self, threshold: float) -> "Detections":
        return self.mask(self.scores >= threshold)

    def to_numpy(self) -> dict[str, np.ndarray]:
        """Host-side edge: drop padding, return compact numpy arrays
        sorted by descending score."""
        valid = np.asarray(self.valid)
        out = {
            "boxes": np.asarray(self.boxes)[valid],
            "scores": np.asarray(self.scores)[valid],
            "classes": np.asarray(self.classes)[valid],
            "kpts": np.asarray(self.kpts)[valid],
        }
        order = np.argsort(-out["scores"], kind="stable")
        return {k: v[order] for k, v in out.items()}


def concat_detections(parts: list[Detections], capacity: int) -> Detections:
    """Concatenate along the capacity axis, then truncate to ``capacity`` keeping
    highest scores. The static-shape replacement for SAHI's Python list
    concatenation of per-slice results (docs sahi/predict.py:290-314)."""
    det = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *parts)
    if det.capacity == capacity:
        return det
    det = det.sort_by_score()
    return jax.tree.map(lambda x: x[:capacity], det)


def batched_empty(
    batch: int, capacity: int, num_keypoints: int = NUM_FACE_KEYPOINTS
) -> Detections:
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (batch,) + x.shape),
        Detections.empty(capacity, num_keypoints),
    )
