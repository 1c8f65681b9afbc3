import numpy as np

from facedet_tpu.engine.fake import FakeBlobDetectionModel


def test_check_devices():
    from facedet_tpu.tools.misc import check_devices

    info = check_devices()
    assert info["num_devices"] == 8 and info["backend"] == "cpu"


def test_plot_results(tmp_path):
    from facedet_tpu.tools.misc import plot_results

    csv = tmp_path / "results.csv"
    csv.write_text("epoch,train_loss\n0,1.0\n1,0.5\n")
    out = plot_results(str(csv))
    assert out is None or out.endswith(".png")


def test_validate_detector():
    from facedet_tpu.tools.misc import validate_detector

    img = np.zeros((100, 120, 3), np.uint8)
    img[29:32, 39:42] = 255
    model = FakeBlobDetectionModel(confidence_threshold=0.5, image_size=64)
    dataset = [{"file_name": "a.jpg", "image_id": 1, "gt": [[35, 25, 10, 10]]}]
    out = validate_detector(model, dataset, lambda _: img, use_sahi=True, slice_size=64,
                            perform_standard_pred=False)
    assert out["map50"] > 0.99


def test_matplotlib_visualizer(tmp_path):
    from facedet_tpu.engine.prediction import ObjectPrediction
    from facedet_tpu.utils.viz_mpl import FaceVisualizer

    img = np.zeros((80, 100, 3), np.uint8)
    preds = [ObjectPrediction([10, 10, 40, 50], 0.9)]
    viz = FaceVisualizer()
    out = viz.draw_detections(img, preds)
    assert out.ndim == 3 and out.shape[2] == 3
    crops = viz.save_face_crops(img, preds, str(tmp_path))
    assert len(crops) == 1 and crops[0].endswith("face_crop_1_conf_0.90.jpg")
    # also accepts raw [x1,y1,x2,y2,score] rows and a PredictionResult-like
    raw_crops = viz.save_face_crops(img, [[5, 5, 30, 30, 0.7]], str(tmp_path), prefix="raw")
    assert len(raw_crops) == 1 and raw_crops[0].endswith("raw_1_conf_0.70.jpg")
    stats = {
        "image_path": "img.jpg",
        "num_faces": 1,
        "processing_time": 0.5,
        "avg_confidence": 0.9,
        "min_confidence": 0.9,
        "max_confidence": 0.9,
        "detections": [{"bbox": [10, 10, 40, 50], "confidence": 0.9}],
    }
    out_path = str(tmp_path / "summary.txt")
    summary = viz.create_detection_summary(stats, save_path=out_path)
    assert "Total Faces Detected: 1" in summary
    assert "Face 1: BBox(10, 10, 40, 50), Conf: 0.900" in summary
    import os

    assert os.path.exists(out_path)


def test_attach_keypoints_compat():
    from facedet_tpu.engine.detector import attach_keypoints_to_predictions
    from facedet_tpu.engine.prediction import ObjectPrediction

    p = ObjectPrediction([10, 10, 20, 20], 0.9)
    p.keypoints = None
    cache = {(10.0, 10.0, 20.0, 20.0): np.ones((5, 3))}
    out = attach_keypoints_to_predictions([p], cache)
    assert out[0].keypoints is not None
    # fuzzy IoU path
    p2 = ObjectPrediction([11, 11, 21, 21], 0.8)
    p2.keypoints = None
    out2 = attach_keypoints_to_predictions([p2], cache, iou_threshold=0.5)
    assert out2[0].keypoints is not None
    # no cache: pass-through
    p3 = ObjectPrediction([0, 0, 5, 5], 0.5)
    assert attach_keypoints_to_predictions([p3], None)[0] is p3
