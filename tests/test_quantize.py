"""int8 post-training quantization (models/quantize.py).

The reference never ships int8 (ultralytics serves fp16); this is the
TPU-side MXU-int8 serving mode that probe_int8_conv justified. Tests run on
CPU: correctness is dtype-exact math, the speed claim is benched on the TPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facedet_tpu.models import quantize
from facedet_tpu.models.layers import ConvBnAct
from facedet_tpu.models.yolov11 import YoloConfig, YoloV11


def _trained_ish_cba(key, cin=16, cout=24, kernel=3):
    """A ConvBnAct variables tree with non-trivial BN stats (as if trained)."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    return {
        "params": {
            "conv": {"kernel": jax.random.normal(k1, (kernel, kernel, cin, cout)) * 0.2},
            "bn": {
                "scale": 1.0 + 0.3 * jax.random.normal(k2, (cout,)),
                "bias": 0.2 * jax.random.normal(k3, (cout,)),
            },
        },
        "batch_stats": {
            "bn": {
                "mean": 0.3 * jax.random.normal(k4, (cout,)),
                "var": jnp.exp(0.5 * jax.random.normal(k5, (cout,))),
            }
        },
    }


def test_single_cba_int8_matches_manual_math():
    """The int8 branch computes exactly round/clip -> int conv -> affine."""
    m = ConvBnAct(features=24, kernel=3)
    variables = _trained_ish_cba(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 16)) * 1.7

    absmax = {(): float(jnp.abs(x).max())}
    qvars = quantize.quantize_variables(variables, absmax, exclude=())
    got = np.asarray(m.apply(qvars, x))

    p = qvars["params"]
    xq = np.clip(np.round(np.asarray(x) / p["ascale"]), -127, 127)
    # f32 conv is integer-exact here: |acc| <= 127^2 * 9 * 16 ~ 2.3e6 < 2^24
    acc = jax.lax.conv_general_dilated(
        jnp.asarray(xq, jnp.float32),
        jnp.asarray(p["qkernel"], jnp.float32),
        (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=jax.lax.conv_dimension_numbers(
            xq.shape, p["qkernel"].shape, ("NHWC", "HWIO", "NHWC")
        ),
    )
    want = np.asarray(acc, np.float32) * p["oscale"] + p["obias"]
    want = want * (1.0 / (1.0 + np.exp(-want)))  # silu
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_single_cba_int8_close_to_f32():
    m = ConvBnAct(features=24, kernel=3)
    variables = _trained_ish_cba(jax.random.PRNGKey(2))
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 16))

    ref = np.asarray(m.apply(variables, x)).ravel()
    qvars = quantize.quantize_variables(
        variables, {(): float(jnp.abs(x).max())}, exclude=()
    )
    got = np.asarray(m.apply(qvars, x)).ravel()
    cos = np.dot(ref, got) / (np.linalg.norm(ref) * np.linalg.norm(got))
    assert cos > 0.999, cos
    # error bounded relative to the layer's dynamic range
    assert np.abs(ref - got).max() < 0.05 * np.abs(ref).max()


def test_yolo_quantize_end_to_end():
    """Calibrate + convert a YoloV11-n; int8 head inputs stay close to f32,
    exclusions (head, early stack, depthwise) are honored."""
    cfg = YoloConfig(scale="n", num_classes=1, with_pose=True)
    model = YoloV11(cfg)
    x = jnp.asarray(
        quantize._natural_tile(128, seed=0), jnp.float32
    )[None] / 255.0
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))

    absmax = quantize.calibrate(model, variables, [x])
    assert ("backbone", "down2") in absmax
    assert all(v > 0 for v in absmax.values())

    qvars = quantize.quantize_variables(variables, absmax)
    qpaths = set(quantize._iter_q(qvars["params"]))
    assert ("backbone", "down2") in qpaths
    assert not any(p[0] == "head" for p in qpaths)
    assert ("backbone", "stem") not in qpaths
    # depthwise pe conv inside C2PSA attention stays float
    assert not any(p[-1] == "pe" for p in qpaths)

    ref = model.apply(variables, x)
    got = model.apply(qvars, x)
    for r, g in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        r = np.asarray(r, np.float32).ravel()
        g = np.asarray(g, np.float32).ravel()
        cos = np.dot(r, g) / max(np.linalg.norm(r) * np.linalg.norm(g), 1e-12)
        assert cos > 0.98, cos


def test_quantize_requires_calibration():
    variables = _trained_ish_cba(jax.random.PRNGKey(4))
    with pytest.raises(ValueError):
        quantize.quantize_variables(variables, {}, exclude=())


def test_quantize_detector_roundtrip():
    """quantize_detector swaps variables in place and the detector's
    tile_forward still runs (mechanics, random weights)."""
    from facedet_tpu.engine.detector import YoloV11PoseDetectionModel

    det = YoloV11PoseDetectionModel(
        scale="n", dtype="float32", confidence_threshold=0.25,
        image_size=128, load_at_init=False,
    )
    det.load_model()
    n = quantize.quantize_detector(det, n_calib=1)
    assert n > 10
    tiles = jnp.zeros((1, 128, 128, 3), jnp.float32)
    out = det.tile_forward(det.variables, tiles, 0.25)
    assert all(np.isfinite(np.asarray(v, np.float32)).all() for v in jax.tree.leaves(out))
