import os

import jax.numpy as jnp
import numpy as np

from facedet_tpu.engine.fake import FakeBlobDetectionModel


def make_image(h, w, dots):
    img = np.zeros((h, w, 3), np.uint8)
    for y, x in dots:
        img[y - 1 : y + 2, x - 1 : x + 2] = 255
    return img


def test_debug_slicing(tmp_path):
    from facedet_tpu.tools.debug_slicing import debug_slicing

    model = FakeBlobDetectionModel(confidence_threshold=0.5)
    img = make_image(100, 120, [(30, 40), (70, 100)])
    info = debug_slicing(img, model, str(tmp_path), slice_size=64, overlap=0.2)
    assert info["num_tiles"] >= 2
    assert info["merged_detections"] == 2
    assert (tmp_path / "tile_00.jpg").exists()
    assert (tmp_path / "merged.jpg").exists()


def test_debug_inference_harnesses():
    from facedet_tpu.tools.debug_inference import (
        compare_direct_vs_wrapper,
        debug_keypoints,
        wrapper_config_info,
    )

    model = FakeBlobDetectionModel(confidence_threshold=0.5, image_size=64)
    img = make_image(100, 100, [(50, 50)])
    rows = compare_direct_vs_wrapper(img, model, image_sizes=(64, 96))
    assert len(rows) == 2 and rows[0]["detections"] >= 1
    info = wrapper_config_info(model)
    assert info["num_keypoints"] == 5
    kp = debug_keypoints(img, model)
    assert kp["has_keypoints"]


def test_training_rollup(tmp_path):
    from facedet_tpu.tools.training_rollup import best_epoch, write_summary

    run = tmp_path / "runs" / "exp1"
    run.mkdir(parents=True)
    (run / "results.csv").write_text("epoch,train_loss\n0,1.5\n1,0.8\n2,0.9\n")
    (run / "config.json").write_text('{"imgsz": 640, "epochs": 3}')
    rows = write_summary(str(tmp_path / "runs"), str(tmp_path / "summary.csv"))
    assert len(rows) == 1
    assert rows[0]["epoch"] == "1"  # min train_loss
    assert rows[0]["imgsz"] == 640
    assert (tmp_path / "summary.csv").exists()
    assert best_epoch([]) is None


def test_model_setup(tmp_path):
    import pytest

    from facedet_tpu.tools.model_setup import (
        ensure_weights,
        generate_sample_images,
        smoke_test_model,
    )

    paths = generate_sample_images(str(tmp_path), n=2, size=(120, 160))
    assert len(paths) == 2 and all(os.path.exists(p) for p in paths)
    assert ensure_weights("x", None) is None
    with pytest.raises(FileNotFoundError):
        ensure_weights("yolo11s-pose", str(tmp_path / "missing.npz"))
    model = FakeBlobDetectionModel(confidence_threshold=0.5, image_size=64)
    assert smoke_test_model(model, size=(64, 64))


def test_profiling_utils():
    from facedet_tpu.utils.profiling import Stopwatch, flops_and_params, measure_latency

    sw = Stopwatch()
    with sw.phase("a"):
        pass
    with sw.phase("a"):
        pass
    assert "a" in sw.durations

    fn = lambda x: (x @ x).sum()
    x = jnp.ones((64, 64))
    stats = flops_and_params(fn, x, params={"w": x})
    assert stats["params"] == 64 * 64
    assert stats["flops"] >= 0
    lat = measure_latency(fn, x, warmup=1, iters=3)
    assert lat["p50_ms"] > 0 and lat["fps"] > 0


def test_yolo_dataset_and_trainer(tmp_path):
    from facedet_tpu.models.yolov11 import YoloConfig
    from facedet_tpu.train.yolo_trainer import YoloDataset, YoloTrainer
    from facedet_tpu.utils.viz import save_image

    images = tmp_path / "images"
    labels = tmp_path / "labels"
    images.mkdir()
    labels.mkdir()
    for i in range(2):
        save_image(str(images / f"im{i}.jpg"), make_image(80, 80, [(40, 40)]))
        (labels / f"im{i}.txt").write_text("0 0.5 0.5 0.25 0.25\n")
    ds = YoloDataset(str(images), str(labels), image_size=64, max_boxes=4)
    batches = list(ds.batches(batch_size=2, shuffle=False))
    assert len(batches) == 1
    imgs, boxes, mask, kpts = batches[0]
    assert imgs.shape == (2, 64, 64, 3)
    assert bool(mask[0, 0]) and not bool(mask[0, 1])
    np.testing.assert_allclose(np.asarray(boxes[0, 0]), [24, 24, 40, 40], atol=1e-4)

    trainer = YoloTrainer(
        YoloConfig(scale="n"), output_dir=str(tmp_path / "run"), image_size=64, save_period=0
    )
    out = trainer.fit(lambda e: ds.batches(2, shuffle=False), num_epochs=1, verbose=False)
    assert out["epochs"] == 1
    assert (tmp_path / "run" / "best.npz").exists()
    assert (tmp_path / "run" / "results.csv").exists()


def test_yolo_dataset_augmentations(tmp_path):
    from facedet_tpu.train.yolo_trainer import YoloDataset
    from facedet_tpu.utils.viz import save_image

    images = tmp_path / "images"
    labels = tmp_path / "labels"
    images.mkdir()
    labels.mkdir()
    for i in range(4):
        save_image(str(images / f"im{i}.jpg"), make_image(80, 80, [(40, 40)]))
        (labels / f"im{i}.txt").write_text("0 0.5 0.5 0.25 0.25\n")
    ds = YoloDataset(str(images), str(labels), image_size=64, max_boxes=8, augment=True, seed=3)
    imgs, boxes, mask, kpts = next(iter(ds.batches(4, shuffle=False, mosaic_prob=1.0)))
    assert imgs.shape == (4, 64, 64, 3)
    # every mosaic sample carries 4 merged GT boxes
    assert int(np.asarray(mask).sum(axis=1).min()) == 4
    b = np.asarray(boxes)[np.asarray(mask)]
    assert (b[:, 2] > b[:, 0]).all() and (b[:, 3] > b[:, 1]).all()
    assert b.max() <= 64.0 + 1e-3

    # mosaic geometry: each quadrant's box center maps to its quadrant
    m_img, m_boxes, m_mask = ds._mosaic([0, 1, 2, 3])
    centers = (m_boxes[m_mask][:, :2] + m_boxes[m_mask][:, 2:]) / 2
    quads = {(int(cx > 32), int(cy > 32)) for cx, cy in centers}
    assert len(quads) == 4

    # hsv jitter keeps range and shape
    out = ds._hsv_jitter(np.full((8, 8, 3), 0.5, np.float32))
    assert out.shape == (8, 8, 3) and out.min() >= 0 and out.max() <= 1
