"""OnnxDetectionModel: ultralytics-export-layout decode + end-to-end engine
compatibility (reference consumes these checkpoints through ultralytics /
onnxruntime — utils/yolo_wrapper.py:55)."""
import jax.numpy as jnp
import numpy as np
import pytest

from facedet_tpu.engine.onnx_wrapper import OnnxDetectionModel


def fake_model(layout, out, num_keypoints=None):
    m = OnnxDetectionModel(
        load_at_init=False, output_layout=layout, image_size=64,
        confidence_threshold=0.3, num_keypoints=num_keypoints,
    )
    m._onnx = lambda params, x: (jnp.asarray(out),)
    m.variables = {"params": {}}
    return m


def test_yolo_layout_decode():
    # [1, 4+nc, A]: one strong box at cxcywh (32, 20, 10, 8), one weak
    a = 6
    out = np.zeros((1, 5, a), np.float32)
    out[0, :, 2] = [32, 20, 10, 8, 0.9]
    out[0, :, 4] = [10, 10, 4, 4, 0.1]
    model = fake_model("yolo", out)
    tiles = jnp.zeros((1, 64, 64, 3))
    det = model.tile_forward(model.variables, tiles, 0.3)
    valid = np.asarray(det.valid[0])
    assert valid.sum() == 1
    box = np.asarray(det.boxes[0][valid.argmax()])
    np.testing.assert_allclose(box, [27, 16, 37, 24], atol=1e-5)
    assert float(det.scores[0][valid.argmax()]) == pytest.approx(0.9)


def test_yolo_pose_layout_keypoints():
    # [1, 4+1+K*3, A] with K=2 keypoints
    a = 4
    out = np.zeros((1, 4 + 1 + 6, a), np.float32)
    out[0, :5, 1] = [30, 30, 8, 8, 0.8]
    out[0, 5:, 1] = [31, 29, 1.0, 33, 35, 0.9]
    model = fake_model("yolo", out, num_keypoints=2)
    det = model.tile_forward(model.variables, jnp.zeros((1, 64, 64, 3)), 0.3)
    i = int(np.asarray(det.valid[0]).argmax())
    np.testing.assert_allclose(np.asarray(det.kpts[0, i, :2]),
                               [[31, 29, 1.0], [33, 35, 0.9]], atol=1e-5)


def test_rtdetr_layout_decode():
    # [1, Q, 4+nc] normalized cxcywh on a 64px tile
    q = 8
    out = np.zeros((1, q, 5), np.float32)
    out[0, 3] = [0.5, 0.5, 0.25, 0.25, 0.7]  # -> pixels (24,24,40,40)
    model = fake_model("rtdetr", out)
    det = model.tile_forward(model.variables, jnp.zeros((1, 64, 64, 3)), 0.3)
    valid = np.asarray(det.valid[0])
    assert valid.sum() == 1
    np.testing.assert_allclose(
        np.asarray(det.boxes[0][valid.argmax()]), [24, 24, 40, 40], atol=1e-4
    )


def test_auto_layout_classification():
    yolo_like = np.zeros((1, 5, 100), np.float32)
    rtdetr_like = np.zeros((1, 100, 5), np.float32)
    m = fake_model("auto", yolo_like)
    assert m._classify_layout(jnp.asarray(yolo_like)) == "yolo"
    assert m._classify_layout(jnp.asarray(rtdetr_like)) == "rtdetr"


def test_exported_graph_end_to_end(tmp_path):
    """A real exported torch graph with ultralytics-style output plumbing runs
    through the fused sliced pipeline."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    from test_onnx_import import export_onnx

    class MicroYoloExport(nn.Module):
        """Conv trunk -> [B, 4+1, A] export-layout head."""

        def __init__(self):
            super().__init__()
            self.c1 = nn.Conv2d(3, 8, 3, stride=8, padding=1)
            self.head = nn.Conv2d(8, 5, 1)

        def forward(self, x):
            y = self.head(torch.relu(self.c1(x)))  # [B, 5, h, w]
            b = y.shape[0]
            y = y.flatten(2)  # [B, 5, A]
            boxes = torch.sigmoid(y[:, :4]) * 64.0
            scores = torch.sigmoid(y[:, 4:5])
            return torch.cat([boxes, scores], 1)

    torch.manual_seed(0)
    path = str(tmp_path / "yolo_export.onnx")
    export_onnx(MicroYoloExport(), torch.randn(1, 3, 64, 64), path)

    model = OnnxDetectionModel(model_path=path, confidence_threshold=0.05)
    assert model.image_size == 64
    from facedet_tpu.engine.predict import get_sliced_prediction

    img = (np.random.default_rng(0).random((100, 130, 3)) * 255).astype(np.uint8)
    result = get_sliced_prediction(
        img, model, slice_height=64, slice_width=64, perform_standard_pred=False
    )
    assert result.detections.boxes.ndim == 2
