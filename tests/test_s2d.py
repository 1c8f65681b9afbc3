"""The space-to-depth early-backbone rewrite is exact vs the standard forward.

models/yolo_s2d.py claims bit-level-equivalent math (zero-padded kernel
permutations); these tests hold it to that on CPU across scales, dtypes and
non-square shapes, including randomised BatchNorm statistics so the folded
affine is load-bearing.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facedet_tpu.models.yolo_s2d import (
    depth_to_space,
    s2d_early_forward,
    space_to_depth,
)
from facedet_tpu.models.yolov11 import YoloConfig, YoloV11


def _randomize_stats(variables, seed=0):
    """Give BN running stats non-trivial values so folding bugs can't hide."""
    rng = np.random.default_rng(seed)

    def rand_like(path, leaf):
        name = path[-1].key
        arr = rng.standard_normal(leaf.shape).astype(np.float32)
        if name == "var":
            arr = np.abs(arr) + 0.25
        return jnp.asarray(arr * 0.5 if name == "mean" else arr)

    stats = jax.tree_util.tree_map_with_path(rand_like, variables["batch_stats"])
    return {**variables, "batch_stats": stats}


def _make(scale, dtype, seed=0):
    cfg = YoloConfig(scale=scale, dtype=dtype)
    model = YoloV11(cfg)
    variables = model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, 64, 64, 3), jnp.float32), train=False
    )
    return cfg, model, _randomize_stats(variables, seed)


def _compare(cfg, model, variables, x, atol):
    ref = model.apply(variables, x, train=False)
    early = s2d_early_forward(variables, x, cfg)
    fast = model.apply(variables, early, train=False, from_early=True)
    for lvl_ref, lvl_fast in zip(ref, fast):
        for key in lvl_ref:
            a, b = np.asarray(lvl_ref[key]), np.asarray(lvl_fast[key])
            scale = max(1.0, float(np.abs(a).max()))
            np.testing.assert_allclose(a, b, atol=atol * scale, rtol=0)


def test_s2d_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 12, 5)), jnp.float32)
    for r in (2, 4):
        y = space_to_depth(x, r)
        assert y.shape == (2, 16 // r, 12 // r, 5 * r * r)
        np.testing.assert_array_equal(np.asarray(depth_to_space(y, r)), np.asarray(x))
    # channel-major ordering: concat commutes with s2d
    a, b = x[..., :2], x[..., 2:]
    lhs = space_to_depth(jnp.concatenate([a, b], axis=-1), 2)
    rhs = jnp.concatenate([space_to_depth(a, 2), space_to_depth(b, 2)], axis=-1)
    np.testing.assert_array_equal(np.asarray(lhs), np.asarray(rhs))


@pytest.mark.parametrize("scale", ["n", "s", "l"])
def test_s2d_forward_matches_standard_f32(scale):
    cfg, model, variables = _make(scale, "float32")
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((2, 96, 64, 3)), jnp.float32)
    _compare(cfg, model, variables, x, atol=2e-4)


def test_s2d_forward_matches_standard_bf16():
    cfg, model, variables = _make("s", "bfloat16")
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    # bf16 accumulation order differs between the two formulations; the bound
    # is the bf16 noise floor of the head activations, not exactness.
    _compare(cfg, model, variables, x, atol=6e-2)


def test_detector_s2d_gate_matches_boxes():
    from facedet_tpu.engine.detector import YoloV11PoseDetectionModel

    model = YoloV11PoseDetectionModel(
        scale="n", dtype="float32", confidence_threshold=0.05, image_size=64,
        max_detections_per_tile=32,
    )
    model.variables = _randomize_stats(model.variables, seed=3)
    rng = np.random.default_rng(3)
    tiles = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)

    model.s2d_early = False
    det_std = model.tile_forward(model.variables, tiles, 0.05)
    model.s2d_early = True
    det_s2d = model.tile_forward(model.variables, tiles, 0.05)

    np.testing.assert_array_equal(
        np.asarray(det_std.valid), np.asarray(det_s2d.valid)
    )
    np.testing.assert_allclose(
        np.asarray(det_std.boxes), np.asarray(det_s2d.boxes), atol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(det_std.scores), np.asarray(det_s2d.scores), atol=1e-3
    )
