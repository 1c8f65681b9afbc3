import jax
import jax.numpy as jnp
import numpy as np

from facedet_tpu.engine.fake import FakeBlobDetectionModel as FakeBlobDetector
from facedet_tpu.engine.predict import get_prediction, get_sliced_prediction


def make_image(h, w, dots):
    img = np.zeros((h, w, 3), np.uint8)
    for y, x in dots:
        img[y - 1 : y + 2, x - 1 : x + 2] = 255
    return img


def test_sliced_prediction_finds_global_dots():
    dots = [(30, 40), (120, 180)]
    img = make_image(150, 200, dots)
    model = FakeBlobDetector(confidence_threshold=0.5)
    result = get_sliced_prediction(
        img,
        model,
        slice_height=64,
        slice_width=64,
        overlap_height_ratio=0.25,
        overlap_width_ratio=0.25,
        perform_standard_pred=False,
        postprocess_type="GREEDYNMM",
        postprocess_match_metric="IOS",
        postprocess_match_threshold=0.5,
    )
    preds = result.object_prediction_list
    assert len(preds) == 2, [p.bbox.to_xyxy() for p in preds]
    centers = sorted(
        ((p.bbox.miny + p.bbox.maxy) / 2, (p.bbox.minx + p.bbox.maxx) / 2)
        for p in preds
    )
    for (cy, cx), (dy, dx) in zip(centers, sorted(dots)):
        assert abs(cy - dy) <= 1.5 and abs(cx - dx) <= 1.5, (centers, dots)
    # keypoints shifted to global coords alongside boxes
    k = preds[0].keypoints
    assert k is not None and k.shape == (5, 3)
    assert any(abs(k[0, 0] - dx) <= 1.5 and abs(k[0, 1] - dy) <= 1.5 for dy, dx in dots)
    assert set(result.durations_in_seconds) >= {"slice", "prediction", "postprocess"}


def test_sliced_with_standard_pred_still_two():
    dots = [(30, 40), (120, 180)]
    img = make_image(150, 200, dots)
    model = FakeBlobDetector(confidence_threshold=0.5)
    result = get_sliced_prediction(
        img,
        model,
        slice_height=64,
        slice_width=64,
        perform_standard_pred=True,
        postprocess_match_metric="IOS",
        postprocess_match_threshold=0.3,
    )
    assert len(result.object_prediction_list) == 2


def test_get_prediction_single_pass():
    img = make_image(100, 100, [(50, 60)])
    model = FakeBlobDetector(confidence_threshold=0.5, image_size=100)
    result = get_prediction(img, model)
    assert len(result.object_prediction_list) == 1
    p = result.object_prediction_list[0]
    cx = (p.bbox.minx + p.bbox.maxx) / 2
    cy = (p.bbox.miny + p.bbox.maxy) / 2
    assert abs(cx - 60) <= 1.5 and abs(cy - 50) <= 1.5


def test_boxes_clipped_to_image():
    img = make_image(80, 80, [(2, 2)])
    model = FakeBlobDetector(confidence_threshold=0.5)
    result = get_sliced_prediction(
        img, model, slice_height=64, slice_width=64, perform_standard_pred=False
    )
    for p in result.object_prediction_list:
        x1, y1, x2, y2 = p.bbox.to_xyxy()
        assert x1 >= 0 and y1 >= 0 and x2 <= 80 and y2 <= 80


def test_prediction_result_exports(tmp_path):
    img = make_image(100, 120, [(40, 50)])
    model = FakeBlobDetector(confidence_threshold=0.5)
    result = get_sliced_prediction(
        img, model, slice_height=64, slice_width=64, perform_standard_pred=False
    )
    coco = result.to_coco_predictions(image_id=7)
    assert coco and coco[0]["image_id"] == 7 and len(coco[0]["bbox"]) == 4
    out = result.export_visuals(str(tmp_path))
    import os

    assert os.path.exists(out)


def test_predict_stream_pipelined():
    from facedet_tpu.engine.predict import predict_stream

    model = FakeBlobDetector(confidence_threshold=0.5)
    imgs = [make_image(100, 120, [(30, 40)]), make_image(100, 120, [(60, 80)]),
            make_image(100, 120, [(20, 100)])]
    results = list(
        predict_stream(imgs, model, window=2, slice_height=64, slice_width=64,
                       perform_standard_pred=False)
    )
    assert len(results) == 3
    for r, img in zip(results, imgs):
        assert len(r.object_prediction_list) == 1
    # raw mode returns the numpy Detections pytree
    raw = list(predict_stream(imgs[:1], model, window=2, slice_height=64,
                              slice_width=64, perform_standard_pred=False, raw=True))
    assert raw[0].boxes.ndim == 2


def test_sliced_prediction_batch_matches_single():
    from facedet_tpu.engine.predict import get_sliced_prediction_batch

    model = FakeBlobDetector(confidence_threshold=0.5)
    imgs = [make_image(100, 120, [(30, 40)]), make_image(100, 120, [(70, 90)])]
    batch = get_sliced_prediction_batch(
        imgs, model, slice_height=64, slice_width=64, perform_standard_pred=False
    )
    assert len(batch) == 2
    for r, (dy, dx) in zip(batch, [(30, 40), (70, 90)]):
        assert len(r.object_prediction_list) == 1
        p = r.object_prediction_list[0]
        assert abs((p.bbox.minx + p.bbox.maxx) / 2 - dx) <= 1.5
        assert abs((p.bbox.miny + p.bbox.maxy) / 2 - dy) <= 1.5
    # single-path agreement
    single = get_sliced_prediction(
        imgs[0], model, slice_height=64, slice_width=64, perform_standard_pred=False
    )
    import numpy as _np

    _np.testing.assert_allclose(
        _np.asarray(batch[0].object_prediction_list[0].bbox.to_xyxy()),
        _np.asarray(single.object_prediction_list[0].bbox.to_xyxy()),
        atol=1e-4,
    )


def test_image_size_bucketing_shares_compilations():
    # two different image sizes inside the same 256-bucket must reuse ONE
    # fused compilation (the anti-recompile contract for variable-res streams)
    model = FakeBlobDetector(confidence_threshold=0.5)
    img_a = make_image(150, 200, [(30, 40)])
    img_b = make_image(180, 230, [(90, 120)])  # same (256, 256) bucket
    for img in (img_a, img_b):
        r = get_sliced_prediction(
            img, model, slice_height=64, slice_width=64, perform_standard_pred=False
        )
        assert len(r.object_prediction_list) == 1
    assert len(model._fused_cache) == 1, list(model._fused_cache)
    # a genuinely bigger image compiles a second variant
    img_c = make_image(300, 500, [(150, 250)])
    get_sliced_prediction(
        img_c, model, slice_height=64, slice_width=64, perform_standard_pred=False
    )
    assert len(model._fused_cache) == 2


def test_predict_stream_batched_double_buffered():
    from facedet_tpu.engine.predict import predict_stream_batched

    model = FakeBlobDetector(confidence_threshold=0.5)
    dots = [(30, 40), (60, 80), (20, 100), (70, 20), (50, 50)]
    imgs = [make_image(100, 120, [d]) for d in dots]
    # mixed sizes force a batch split mid-stream
    imgs.append(make_image(120, 100, [(90, 30)]))
    batches = list(
        predict_stream_batched(
            imgs, model, batch_size=2, window=2,
            slice_height=64, slice_width=64, perform_standard_pred=False,
        )
    )
    results = [r for b in batches for r in b]
    assert len(results) == len(imgs)
    expected = dots + [(90, 30)]
    for r, (dy, dx) in zip(results, expected):
        assert len(r.object_prediction_list) == 1, (dy, dx)
        p = r.object_prediction_list[0]
        assert abs((p.bbox.minx + p.bbox.maxx) / 2 - dx) <= 1.5
        assert abs((p.bbox.miny + p.bbox.maxy) / 2 - dy) <= 1.5
    # raw mode yields batched Detections pytrees
    raw = next(iter(predict_stream_batched(
        imgs[:2], model, batch_size=2, slice_height=64, slice_width=64,
        perform_standard_pred=False, raw=True,
    )))
    assert raw.boxes.ndim == 3 and raw.boxes.shape[0] == 2


def test_sliced_prediction_device_array_input():
    """A device-resident float image (the enhance-first pipeline's SR
    output) slices on device with no host round-trip and matches the
    host-numpy path; return_image=False skips the display fetch."""
    import jax.numpy as jnp

    from facedet_tpu.engine.fake import FakeBlobDetectionModel
    from facedet_tpu.engine.predict import get_sliced_prediction

    m = FakeBlobDetectionModel(confidence_threshold=0.5)
    img = np.zeros((100, 120, 3), np.uint8)
    img[29:32, 39:42] = 255
    img[69:72, 89:92] = 255
    r_np = get_sliced_prediction(img, m, slice_height=64, slice_width=64)
    dev = jnp.asarray(img, jnp.float32) / 255.0
    r_dev = get_sliced_prediction(dev, m, slice_height=64, slice_width=64)
    ba = np.array([p.bbox.to_xyxy() for p in r_np.object_prediction_list])
    bb = np.array([p.bbox.to_xyxy() for p in r_dev.object_prediction_list])
    assert len(ba) == len(bb) == 2
    np.testing.assert_allclose(ba, bb, atol=1e-3)
    np.testing.assert_array_equal(r_dev.image, img)  # display fetch round-trips
    r_noimg = get_sliced_prediction(
        dev, m, slice_height=64, slice_width=64, return_image=False
    )
    assert r_noimg.image is None
    assert len(r_noimg.object_prediction_list) == 2


def test_enhance_first_pipeline_device_flow():
    """enhance_first_pipeline keeps the SR output on device for detection
    and still attaches a host uint8 enhanced_image."""
    from facedet_tpu.engine.enhancer import FaceEnhancer
    from facedet_tpu.engine.fake import FakeBlobDetectionModel
    from facedet_tpu.engine.pipelines import enhance_first_pipeline
    from facedet_tpu.models.rrdbnet import RRDBConfig

    m = FakeBlobDetectionModel(confidence_threshold=0.5)
    enh = FaceEnhancer(
        cfg=RRDBConfig(num_feat=8, num_block=1, num_grow_ch=4, scale=2),
        outscale=2, tile=0, half=False,
    )
    img = np.full((60, 80, 3), 30, np.uint8)
    img[20:24, 30:34] = 255
    out = enhance_first_pipeline(img, m, enh, slice_policy="fixed_grid")
    assert out.image.shape == (60, 80, 3)
    assert out.enhanced_image.shape == (120, 160, 3)
    assert out.enhanced_image.dtype == np.uint8
    # detections map back into original coordinates
    for p in out.object_prediction_list:
        x1, y1, x2, y2 = p.bbox.to_xyxy()
        assert 0 <= x1 <= 80 and 0 <= y2 <= 60


def test_resident_variables_cache_invalidates_on_swap():
    import jax

    from facedet_tpu.engine.fake import FakeBlobDetectionModel
    from facedet_tpu.engine.predict import _resident_variables

    m = FakeBlobDetectionModel(confidence_threshold=0.5)
    m.variables = {"w": np.ones(4, np.float32)}
    dev = jax.devices()[0]
    a = _resident_variables(m, dev)
    assert _resident_variables(m, dev) is a  # cached
    m.variables = {"w": np.zeros(4, np.float32)}  # checkpoint swap
    b = _resident_variables(m, dev)
    assert b is not a
    np.testing.assert_array_equal(np.asarray(b["w"]), 0.0)
    # unload clears the device copies
    m.unload_model()
    assert "_resident_vars" not in m.__dict__


def test_fetch_capacity_compaction_matches_full_fetch():
    # serving compaction (engine/predict.py fetch_capacity): the merged
    # result truncated to top-k rows on device must carry the same valid
    # detections as the full-capacity fetch when count < fetch_capacity
    dots = [(30, 40), (120, 180), (70, 100)]
    img = make_image(150, 200, dots)
    model = FakeBlobDetector(confidence_threshold=0.5)
    kw = dict(
        slice_height=64,
        slice_width=64,
        perform_standard_pred=False,
        postprocess_match_metric="IOS",
        postprocess_match_threshold=0.5,
    )
    full = get_sliced_prediction(img, model, **kw)
    compact = get_sliced_prediction(img, model, fetch_capacity=16, **kw)
    assert compact.detections.boxes.shape[0] == 16
    a, b = full.detections.to_numpy(), compact.detections.to_numpy()
    assert a["boxes"].shape == b["boxes"].shape
    np.testing.assert_allclose(a["boxes"], b["boxes"], atol=1e-5)
    np.testing.assert_allclose(a["scores"], b["scores"], atol=1e-6)
    np.testing.assert_allclose(a["kpts"], b["kpts"], atol=1e-5)


def test_fetch_capacity_keeps_highest_scores_when_overflowing():
    # more merged detections than fetch_capacity: the compaction must keep
    # the top-scored rows (ultralytics max_det semantics)
    rng = np.random.default_rng(0)
    dots = [
        (int(y), int(x))
        for y, x in zip(rng.integers(5, 145, 12), rng.integers(5, 195, 12))
    ]
    # de-duplicate blob positions that would merge into one detection
    dots = [d for i, d in enumerate(dots) if all(
        abs(d[0] - e[0]) + abs(d[1] - e[1]) > 12 for e in dots[:i]
    )]
    img = make_image(150, 200, dots)
    model = FakeBlobDetector(confidence_threshold=0.5)
    kw = dict(
        slice_height=64,
        slice_width=64,
        perform_standard_pred=False,
        postprocess_match_metric="IOS",
        postprocess_match_threshold=0.5,
    )
    full = get_sliced_prediction(img, model, **kw).detections.to_numpy()
    k = max(1, len(full["scores"]) - 2)
    compact = get_sliced_prediction(
        img, model, fetch_capacity=k, **kw
    ).detections.to_numpy()
    assert len(compact["scores"]) == k
    np.testing.assert_allclose(compact["scores"], full["scores"][:k], atol=1e-6)
