import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facedet_tpu.models.scrfd import (
    NUM_ANCHORS,
    SCRFD_VARIANTS,
    STRIDES,
    ScrfdConfig,
    create_scrfd,
    decode_scrfd,
)

TINY = ScrfdConfig(stem=8, widths=(8, 12, 16, 24), depths=(1, 1, 1, 1), neck=12, head_width=16, head_depth=1)


@pytest.fixture(scope="module")
def tiny_scrfd():
    return create_scrfd(TINY, jax.random.PRNGKey(0), image_size=96)


def test_forward_shapes(tiny_scrfd):
    model, variables = tiny_scrfd
    x = jnp.zeros((2, 96, 96, 3))
    outs = model.apply(variables, x, train=False)
    assert len(outs) == 3
    for lvl, stride in zip(outs, STRIDES):
        h = w = 96 // stride
        assert lvl["cls"].shape == (2, h, w, NUM_ANCHORS)
        assert lvl["box"].shape == (2, h, w, NUM_ANCHORS * 4)
        assert lvl["kps"].shape == (2, h, w, NUM_ANCHORS * 10)


def test_decode_distance2bbox():
    # one level, known distances: center (0,0), dist ltrb = 1 cell * stride
    levels = []
    for stride in STRIDES:
        h = w = 2
        levels.append(
            {
                "cls": jnp.zeros((1, h, w, NUM_ANCHORS)),
                "box": jnp.ones((1, h, w, NUM_ANCHORS * 4)),
                "kps": jnp.zeros((1, h, w, NUM_ANCHORS * 10)),
            }
        )
    preds = decode_scrfd(levels)
    assert preds["boxes"].shape == (1, 3 * 4 * NUM_ANCHORS, 4)
    # first anchor of stride 8: center (0,0), dist 8 -> box [-8,-8,8,8]
    np.testing.assert_allclose(np.asarray(preds["boxes"][0, 0]), [-8, -8, 8, 8], atol=1e-5)
    np.testing.assert_allclose(np.asarray(preds["scores"][0, 0, 0]), 0.5, atol=1e-6)
    # keypoints at center with score as confidence
    np.testing.assert_allclose(np.asarray(preds["kpts"][0, 0, :, :2]), 0.0, atol=1e-5)


def test_wrapper_and_face_analysis():
    from facedet_tpu.engine.scrfd_wrapper import FaceAnalysis, ScrfdDetectionModel

    model = ScrfdDetectionModel(
        variant="scrfd_500m", confidence_threshold=0.3, image_size=64, dtype="float32"
    )
    det = model.forward_tiles(jnp.zeros((1, 64, 64, 3)))
    assert det.boxes.shape[0] == 1

    fa = FaceAnalysis(name="scrfd_500m")
    fa.prepare(ctx_id=0, det_size=(-1, 0), det_thresh=0.4)  # self-heal guard
    assert fa.det_size == (640, 640)


def test_variants_param_ordering():
    sizes = {}
    for name in ("scrfd_500m", "scrfd_2.5g"):
        cfg = SCRFD_VARIANTS[name]
        _, v = create_scrfd(cfg, jax.random.PRNGKey(0), image_size=64)
        sizes[name] = sum(x.size for x in jax.tree.leaves(v["params"]))
    assert sizes["scrfd_500m"] < sizes["scrfd_2.5g"]


def test_onnx_checkpoint_end_to_end(tmp_path):
    """Pretrained-.onnx path: insightface-convention graph -> ScrfdDetectionModel
    -> fused sliced pipeline, plus a numpy distance2bbox decode parity check."""
    pytest.importorskip("torch")
    import torch

    from test_onnx_import import MicroScrfd, export_onnx

    torch.manual_seed(7)
    net = MicroScrfd()
    path = str(tmp_path / "scrfd_micro.onnx")
    export_onnx(net, torch.randn(1, 3, 64, 64), path)

    from facedet_tpu.engine.scrfd_wrapper import ScrfdDetectionModel

    model = ScrfdDetectionModel(
        model_path=path, confidence_threshold=0.05, image_size=64
    )
    assert model._onnx is not None

    # decode parity vs an insightface-style numpy decode of the torch outputs
    rng = np.random.default_rng(7)
    tile = rng.random((64, 64, 3), np.float32)
    blob = ((tile * 255.0 - 127.5) / 128.0).transpose(2, 0, 1)[None]
    with torch.no_grad():
        t_outs = [o.numpy() for o in net(torch.as_tensor(blob))]
    import jax.numpy as jnp

    from facedet_tpu.models.scrfd import decode_scrfd_flat

    preds = decode_scrfd_flat(
        tuple(jnp.asarray(o) for o in t_outs), (64, 64)
    )
    want_boxes = []
    for i, stride in enumerate((8, 16, 32)):
        fh = fw = 64 // stride
        centers = np.stack(np.mgrid[:fh, :fw][::-1], axis=-1).astype(np.float32)
        centers = (centers * stride).reshape(-1, 2)
        centers = np.stack([centers] * 2, axis=1).reshape(-1, 2)
        dist = t_outs[i + 3][0] * stride
        want_boxes.append(
            np.concatenate([centers - dist[:, :2], centers + dist[:, 2:]], -1)
        )
    np.testing.assert_allclose(
        np.asarray(preds["boxes"][0]), np.concatenate(want_boxes, 0), atol=1e-3
    )

    # full sliced pipeline executes over the tile batch
    from facedet_tpu.engine.predict import get_sliced_prediction

    img = (rng.random((100, 130, 3)) * 255).astype(np.uint8)
    result = get_sliced_prediction(
        img, model, slice_height=64, slice_width=64, perform_standard_pred=False
    )
    det = result.detections
    assert det.boxes.ndim == 2  # pipeline produced a Detections pytree
