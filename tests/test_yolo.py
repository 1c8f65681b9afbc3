import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facedet_tpu.models.yolo_decode import decode_predictions, decode_to_detections
from facedet_tpu.models.yolov11 import REG_MAX, STRIDES, YoloConfig, create_yolo


@pytest.fixture(scope="module")
def tiny_model():
    cfg = YoloConfig(scale="n", num_classes=1, with_pose=True)
    model, variables = create_yolo(cfg, jax.random.PRNGKey(0), image_size=128)
    return cfg, model, variables


def test_forward_shapes(tiny_model):
    cfg, model, variables = tiny_model
    x = jnp.zeros((2, 128, 128, 3), jnp.float32)
    outs = model.apply(variables, x, train=False)
    assert len(outs) == 3
    for lvl, stride in zip(outs, STRIDES):
        h = w = 128 // stride
        assert lvl["box"].shape == (2, h, w, 4 * REG_MAX)
        assert lvl["cls"].shape == (2, h, w, 1)
        assert lvl["kpt"].shape == (2, h, w, 15)


def test_decode_uniform_dfl_centers_boxes():
    # zero logits -> uniform softmax -> expected distance = mean(0..15) = 7.5
    b, h, w = 1, 2, 2
    levels = []
    for stride in STRIDES:
        levels.append(
            {
                "box": jnp.zeros((b, h, w, 4 * REG_MAX)),
                "cls": jnp.zeros((b, h, w, 1)),
            }
        )
    preds = decode_predictions(levels)
    assert preds["boxes"].shape == (1, 12, 4)
    # first anchor of first level: center (0.5, 0.5) cells, stride 8
    np.testing.assert_allclose(
        np.asarray(preds["boxes"][0, 0]),
        [(0.5 - 7.5) * 8, (0.5 - 7.5) * 8, (0.5 + 7.5) * 8, (0.5 + 7.5) * 8],
        atol=1e-4,
    )
    # zero cls logit -> sigmoid 0.5
    np.testing.assert_allclose(np.asarray(preds["scores"][0, 0, 0]), 0.5, atol=1e-6)


def test_decode_keypoints():
    b, h, w = 1, 1, 1
    km = jnp.zeros((b, h, w, 15))
    levels = [
        {"box": jnp.zeros((b, h, w, 64)), "cls": jnp.zeros((b, h, w, 1)), "kpt": km}
        for _ in STRIDES
    ]
    preds = decode_predictions(levels)
    assert preds["kpts"].shape == (1, 3, 5, 3)
    # kpt raw 0 -> x = (0*2 + 0.5 - 0.5) * stride = 0
    np.testing.assert_allclose(np.asarray(preds["kpts"][0, 0, :, :2]), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(preds["kpts"][0, 0, :, 2]), 0.5, atol=1e-6)


def test_decode_to_detections_threshold_and_nms():
    a = 8
    boxes = jnp.tile(jnp.array([[0.0, 0.0, 10.0, 10.0]]), (a, 1))[None]
    scores = jnp.array([[0.9, 0.8, 0.1, 0.05, 0.04, 0.03, 0.02, 0.01]])[..., None]
    det = decode_to_detections(
        {"boxes": boxes, "scores": scores}, conf_threshold=0.25, max_detections=4
    )
    out = jax.tree.map(lambda x: x[0], det)
    res = out.to_numpy()
    # identical boxes -> NMS keeps only the best one above threshold
    np.testing.assert_allclose(res["scores"], [0.9])


def test_end_to_end_tiny(tiny_model):
    cfg, model, variables = tiny_model
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 128, 128, 3))
    outs = model.apply(variables, x, train=False)
    preds = decode_predictions(outs)
    det = decode_to_detections(preds, conf_threshold=0.0, max_detections=16)
    assert det.boxes.shape == (1, 16, 4)
    assert det.kpts.shape == (1, 16, 5, 3)


def test_param_counts_scale():
    # yolo11n ~2.9M params (pose ~2.9M+kpt branch); sanity: n < s
    cfg_n = YoloConfig(scale="n", with_pose=False)
    _, vn = create_yolo(cfg_n, jax.random.PRNGKey(0), image_size=64)
    n_params = sum(x.size for x in jax.tree.leaves(vn["params"]))
    assert 1.5e6 < n_params < 4.5e6, n_params
