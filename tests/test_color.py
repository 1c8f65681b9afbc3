"""YUV420 low-bandwidth ingest: color math, device conversion, native decode,
and end-to-end pipeline parity vs the RGB path (ops/color.py)."""
import io

import numpy as np
import pytest

from facedet_tpu.ops.color import (
    rgb_to_yuv420,
    yuv420_bytes,
    yuv420_to_rgb_f32,
    yuv420_to_rgb_np,
)


def natural_image(h, w, seed=0):
    rng = np.random.default_rng(seed)
    base = np.zeros((h, w), np.float32)
    for octave in (4, 16, 64):
        up = np.kron(
            rng.standard_normal((octave, octave)).astype(np.float32),
            np.ones((-(-h // octave), -(-w // octave)), np.float32),
        )[:h, :w]
        base += up / octave**0.5
    base = (base - base.min()) / (base.max() - base.min())
    return np.stack([base * 255, base * 200 + 30, 255 - base * 220], -1).astype(
        np.uint8
    )


def test_yuv_bytes_are_half_of_rgb():
    assert yuv420_bytes(256, 512) == 256 * 512 * 3 // 2


def test_matrix_matches_pil_ycbcr():
    """Our BT.601 forward matrix agrees with PIL's JPEG-convention YCbCr."""
    from PIL import Image

    img = natural_image(64, 64)
    ours_y, ours_uv = rgb_to_yuv420(img)
    pil = np.asarray(Image.fromarray(img).convert("YCbCr"))
    assert np.abs(ours_y.astype(int) - pil[..., 0].astype(int)).max() <= 1
    # chroma: compare against PIL's full-res planes box-averaged 2x2
    for c in (1, 2):
        ref = pil[..., c].astype(np.float32).reshape(32, 2, 32, 2).mean((1, 3))
        assert np.abs(ours_uv[..., c - 1].astype(np.float32) - ref).max() <= 1.5


def test_round_trip_small_error_on_natural_image():
    img = natural_image(96, 128)
    y, uv = rgb_to_yuv420(img)
    back = yuv420_to_rgb_np(y, uv)
    err = np.abs(back.astype(np.float32) - img.astype(np.float32))
    assert err.mean() < 3.0, err.mean()  # chroma-subsample loss only


def test_device_conversion_matches_host():
    img = natural_image(64, 96, seed=3)
    y, uv = rgb_to_yuv420(img)
    dev = np.asarray(yuv420_to_rgb_f32(y, uv)) * 255.0
    host = yuv420_to_rgb_np(y, uv).astype(np.float32)
    # bilinear (device) vs nearest (host viz) chroma upsample filters differ;
    # both reconstruct the same YUV data (round-trip test bounds the loss)
    assert np.abs(dev - host).mean() < 5.0
    assert dev.min() >= 0.0 and dev.max() <= 255.0


def test_odd_dimensions_handled():
    img = natural_image(33, 47, seed=5)
    y, uv = rgb_to_yuv420(img)
    assert y.shape == (33, 47) and uv.shape == (17, 24, 2)
    back = yuv420_to_rgb_np(y, uv)
    assert back.shape == img.shape


def test_pipeline_parity_rgb_vs_yuv420():
    """The fused sliced pipeline finds the same detections through the
    1.5-byte/pixel planar ingest as through the RGB canvas."""
    from facedet_tpu.engine.fake import FakeBlobDetectionModel
    from facedet_tpu.engine.predict import get_sliced_prediction

    img = np.zeros((150, 200, 3), np.uint8)
    for yy, xx in [(30, 40), (120, 180)]:
        img[yy - 1 : yy + 2, xx - 1 : xx + 2] = 255
    model = FakeBlobDetectionModel(confidence_threshold=0.5)
    kw = dict(
        slice_height=64,
        slice_width=64,
        overlap_height_ratio=0.25,
        overlap_width_ratio=0.25,
        perform_standard_pred=False,
    )
    ref = get_sliced_prediction(img, model, **kw)
    out = get_sliced_prediction(img, model, input_format="yuv420", **kw)
    ref_boxes = sorted(tuple(p.bbox.to_xyxy()) for p in ref.object_prediction_list)
    out_boxes = sorted(tuple(p.bbox.to_xyxy()) for p in out.object_prediction_list)
    assert len(ref_boxes) == len(out_boxes) == 2
    assert np.allclose(np.array(ref_boxes), np.array(out_boxes), atol=2.0)
    # pre-decoded planes accepted directly (the native-decoder ingest path)
    planes = rgb_to_yuv420(img)
    out2 = get_sliced_prediction(planes, model, input_format="yuv420", **kw)
    assert len(out2.object_prediction_list) == 2
    assert out2.image.shape == img.shape  # reconstructed for visualization


def test_batched_stream_yuv420():
    from facedet_tpu.engine.fake import FakeBlobDetectionModel
    from facedet_tpu.engine.predict import predict_stream_batched

    img = np.zeros((128, 128, 3), np.uint8)
    img[60:63, 70:73] = 255
    model = FakeBlobDetectionModel(confidence_threshold=0.5)
    planes = rgb_to_yuv420(img)
    batches = list(
        predict_stream_batched(
            [planes] * 4,
            model,
            batch_size=2,
            slice_height=64,
            slice_width=64,
            perform_standard_pred=False,
            input_format="yuv420",
        )
    )
    results = [r for b in batches for r in b]
    assert len(results) == 4
    for r in results:
        assert len(r.object_prediction_list) == 1


def test_native_yuv_decode_or_fallback(tmp_path):
    """load_image_yuv420 returns planes consistent with the RGB decode for a
    real 4:2:0 JPEG (native raw path or PIL fallback)."""
    from PIL import Image

    from facedet_tpu.data.native_loader import load_image, load_image_yuv420

    img = natural_image(90, 130, seed=7)
    path = str(tmp_path / "a.jpg")
    Image.fromarray(img).save(path, quality=92, subsampling=2)  # force 4:2:0
    planes = load_image_yuv420(path)
    assert planes is not None
    y, uv = planes
    assert y.shape == (90, 130) and uv.shape == (45, 65, 2)
    rgb = load_image(path)
    # the decoded Y plane IS the luma of the RGB decode (tight: same data)
    luma = rgb.astype(np.float32) @ np.array([0.299, 0.587, 0.114], np.float32)
    assert np.abs(y.astype(np.float32) - luma).mean() < 1.5
    back = yuv420_to_rgb_np(y, uv)
    err = np.abs(back.astype(np.float32) - rgb.astype(np.float32)).mean()
    assert err < 6.0, err  # same data, modulo chroma upsample filter choice


def test_native_yuv_decode_non420_falls_back(tmp_path):
    from PIL import Image

    from facedet_tpu.data.native_loader import load_image_yuv420

    img = natural_image(40, 56, seed=9)
    path = str(tmp_path / "b.jpg")
    Image.fromarray(img).save(path, quality=95, subsampling=0)  # 4:4:4
    planes = load_image_yuv420(path)
    assert planes is not None  # RGB-decode + host-subsample fallback
    assert planes[0].shape == (40, 56)
