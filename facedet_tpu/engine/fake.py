"""Deterministic fake detector backend.

SURVEY.md §4's rebuild implication: a synthetic detector so the SAHI engine,
pipelines and evaluators are testable without model weights. Emits one
detection per tile at the brightest pixel (score = brightness), with keypoints
at the same location — fully jit-traceable, so it exercises the exact fused
pipeline the real models use.
"""
from __future__ import annotations

import jax.numpy as jnp

from facedet_tpu.core.detections import Detections
from facedet_tpu.engine.detector import DetectionModel


class FakeBlobDetectionModel(DetectionModel):
    BOX_R = 5.0
    CAPACITY = 4

    def load_model(self):
        self.model = "fake-blob"
        self.variables = {}

    def tile_forward(self, variables, tiles, conf_threshold):
        t = tiles.shape[0]
        gray = tiles.mean(axis=-1).reshape(t, -1)
        idx = jnp.argmax(gray, axis=1)
        score = jnp.max(gray, axis=1)
        y = (idx // tiles.shape[2]).astype(jnp.float32)
        x = (idx % tiles.shape[2]).astype(jnp.float32)
        r = self.BOX_R
        boxes = jnp.stack([x - r, y - r, x + r, y + r], axis=-1)
        cap = self.CAPACITY
        return Detections(
            boxes=jnp.zeros((t, cap, 4)).at[:, 0].set(boxes),
            scores=jnp.zeros((t, cap)).at[:, 0].set(score),
            classes=jnp.zeros((t, cap), jnp.int32),
            kpts=jnp.zeros((t, cap, 5, 3))
            .at[:, 0, :, 0]
            .set(x[:, None])
            .at[:, 0, :, 1]
            .set(y[:, None])
            .at[:, 0, :, 2]
            .set(1.0),
            valid=jnp.zeros((t, cap), bool).at[:, 0].set(score >= conf_threshold),
        )
