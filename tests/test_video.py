"""Video IO + video prediction pipeline tests (reference video modes:
pipeline_v3_RTDETR/inference.py:60-163, docs sahi/predict.py:385)."""
import struct

import numpy as np
import pytest

from facedet_tpu.data.video import (
    MjpegAviWriter,
    read_video_frames,
    video_info,
    write_video,
)


def smooth_frames(n=5, h=64, w=80, seed=0):
    """Low-frequency frames so JPEG round-trip error stays small."""
    rng = np.random.default_rng(seed)
    frames = []
    for i in range(n):
        base = rng.uniform(40, 200, (4, 5, 3))
        big = np.kron(base, np.ones((h // 4, w // 5, 1)))
        frames.append(big.astype(np.uint8))
    return frames


def test_mjpeg_avi_roundtrip(tmp_path):
    path = str(tmp_path / "clip.avi")
    frames = smooth_frames(6)
    assert write_video(path, frames, fps=10.0, quality=95) == 6

    info = video_info(path)
    assert info["width"] == 80 and info["height"] == 64
    assert info["num_frames"] == 6 and abs(info["fps"] - 10.0) < 0.1

    got = list(read_video_frames(path))
    assert len(got) == 6
    for g, want in zip(got, frames):
        assert g.shape == want.shape
        assert np.mean(np.abs(g.astype(float) - want.astype(float))) < 4.0  # JPEG loss


def test_avi_is_standard_riff(tmp_path):
    path = str(tmp_path / "c.avi")
    write_video(path, smooth_frames(2), fps=5)
    raw = open(path, "rb").read()
    assert raw[:4] == b"RIFF" and raw[8:12] == b"AVI "
    assert struct.unpack("<I", raw[4:8])[0] == len(raw) - 8  # RIFF size field
    assert b"movi" in raw and b"idx1" in raw and b"MJPG" in raw


def write_y4m(path, frames, fps=(10, 1)):
    h, w = frames[0].shape[:2]
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C420jpeg\n".encode())
        for fr in frames:
            # gray-only frames: Y = value, U = V = 128 (exactly invertible)
            y = fr[..., 0]
            f.write(b"FRAME\n")
            f.write(y.astype(np.uint8).tobytes())
            f.write(np.full((h // 2, w // 2), 128, np.uint8).tobytes())
            f.write(np.full((h // 2, w // 2), 128, np.uint8).tobytes())


def test_y4m_reader(tmp_path):
    path = str(tmp_path / "clip.y4m")
    vals = [30, 90, 200]
    frames = [np.full((32, 48, 3), v, np.uint8) for v in vals]
    write_y4m(path, frames)
    info = video_info(path)
    assert (info["width"], info["height"]) == (48, 32)
    assert abs(info["fps"] - 10.0) < 1e-6
    got = list(read_video_frames(path))
    assert len(got) == 3
    for g, v in zip(got, vals):
        assert g.shape == (32, 48, 3)
        assert np.all(np.abs(g.astype(int) - v) <= 1)


def test_frame_size_change_rejected(tmp_path):
    w = MjpegAviWriter(str(tmp_path / "x.avi"))
    w.write(np.zeros((16, 16, 3), np.uint8))
    with pytest.raises(ValueError):
        w.write(np.zeros((8, 16, 3), np.uint8))


def blob_video(tmp_path, n=4, h=96, w=120):
    """Frames with one bright blob each at known positions."""
    centers = [(30, 40), (60, 80), (20, 100), (70, 30)][:n]
    frames = []
    for cy, cx in centers:
        img = np.zeros((h, w, 3), np.uint8)
        img[cy - 2 : cy + 3, cx - 2 : cx + 3] = 255
        frames.append(img)
    path = str(tmp_path / "blobs.avi")
    write_video(path, frames, fps=5, quality=98)
    return path, centers


def test_predict_video_end_to_end(tmp_path):
    from facedet_tpu.engine.batch_predict import predict
    from facedet_tpu.engine.fake import FakeBlobDetectionModel

    path, centers = blob_video(tmp_path)
    model = FakeBlobDetectionModel(confidence_threshold=0.5, image_size=64)
    out = predict(
        detection_model=model,
        source=path,
        slice_height=64,
        slice_width=64,
        no_standard_prediction=True,
        project=str(tmp_path / "runs"),
        verbose=0,
    )
    assert out["num_frames"] == len(centers)
    import json
    import os

    export = out["export_dir"]
    dets = json.load(open(os.path.join(export, "result.json")))
    assert {d["image_id"] for d in dets} == set(range(len(centers)))
    # annotated MJPEG AVI written and readable
    vids = [f for f in os.listdir(export) if f.endswith(".avi")]
    assert len(vids) == 1
    annotated = list(read_video_frames(os.path.join(export, vids[0])))
    assert len(annotated) == len(centers)
    # detections land on the blob centers
    for d, (cy, cx) in zip(sorted(dets, key=lambda d: d["image_id"]), centers):
        x, y, bw, bh = d["bbox"]
        assert abs(x + bw / 2 - cx) <= 2 and abs(y + bh / 2 - cy) <= 2


def test_facedetector_detect_video(tmp_path):
    from facedet_tpu.engine.rtdetr_wrapper import FaceDetector

    path, centers = blob_video(tmp_path, n=3)
    det = FaceDetector(variant="rtdetr-tiny", conf=0.99, image_size=64)
    out = det.detect_video(path, str(tmp_path / "out.avi"), verbose=False)
    assert out["frames"] == 3
    assert (tmp_path / "out.avi").exists() or out["faces"] == 0
    # webcam mode degrades with a clear error on camera-less hosts
    with pytest.raises(RuntimeError, match="webcam"):
        list(det.detect_webcam(device="/dev/nonexistent-video"))


def test_predict_video_dct420_ingest(tmp_path):
    """MJPEG frames ship their own stored JPEG coefficients to the pipeline
    (ingest="dct420": native in-memory coefficient reader -> DctImage ->
    entropy-domain upload); detections match the RGB-decode path."""
    from facedet_tpu.engine.batch_predict import predict_video
    from facedet_tpu.engine.fake import FakeBlobDetectionModel

    path, centers = blob_video(tmp_path)
    model = FakeBlobDetectionModel(confidence_threshold=0.5, image_size=64)
    out = predict_video(
        detection_model=model,
        source=path,
        slice_height=64,
        slice_width=64,
        no_standard_prediction=True,
        project=str(tmp_path / "runs_dct"),
        verbose=0,
        ingest="dct420",
    )
    assert out["num_frames"] == len(centers)
    import json
    import os

    dets = json.load(open(os.path.join(out["export_dir"], "result.json")))
    for d, (cy, cx) in zip(sorted(dets, key=lambda d: d["image_id"]), centers):
        x, y, bw, bh = d["bbox"]
        assert abs(x + bw / 2 - cx) <= 2 and abs(y + bh / 2 - cy) <= 2
    # annotated AVI frames reconstruct from coefficients (result.image path)
    vids = [f for f in os.listdir(out["export_dir"]) if f.endswith(".avi")]
    assert len(vids) == 1


def test_decode_jpeg_bytes_dct420_matches_file_reader(tmp_path):
    """The in-memory coefficient reader returns bit-identical planes to the
    file reader for the same JPEG bytes."""
    from PIL import Image

    from facedet_tpu.data.native_loader import (
        decode_jpeg_bytes_dct420,
        load_image_dct420,
    )

    rng = np.random.default_rng(11)
    img = np.clip(
        np.kron(rng.integers(40, 200, (6, 8, 3)), np.ones((16, 16, 1))), 0, 255
    ).astype(np.uint8)
    path = str(tmp_path / "m.jpg")
    Image.fromarray(img).save(path, quality=90, subsampling=2)
    d_file = load_image_dct420(path)
    d_mem = decode_jpeg_bytes_dct420(open(path, "rb").read())
    assert d_mem.hw == d_file.hw
    np.testing.assert_array_equal(d_mem.y_dc, d_file.y_dc)
    np.testing.assert_array_equal(d_mem.y_ac, d_file.y_ac)
    np.testing.assert_array_equal(d_mem.uv_dc, d_file.uv_dc)
    np.testing.assert_array_equal(d_mem.uv_ac, d_file.uv_ac)
    np.testing.assert_array_equal(d_mem.qy, d_file.qy)


def test_y4m_yuv420_plane_passthrough(tmp_path):
    """ingest="yuv420" on a Y4M source yields the file's stored planes
    untouched, and predict_video runs them through the planar upload path."""
    from facedet_tpu.data.video import read_video_frames
    from facedet_tpu.engine.batch_predict import predict_video
    from facedet_tpu.engine.fake import FakeBlobDetectionModel
    from facedet_tpu.ops.color import rgb_to_yuv420

    h, w = 96, 128
    frames_rgb = []
    for cx in (40, 80):
        img = np.zeros((h, w, 3), np.uint8)
        img[30:33, cx - 1 : cx + 2] = 255
        frames_rgb.append(img)
    path = str(tmp_path / "clip.y4m")
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{w} H{h} F5:1 C420\n".encode())
        for img in frames_rgb:
            y, uv = rgb_to_yuv420(img)
            f.write(b"FRAME\n")
            f.write(y.tobytes())
            f.write(uv[..., 0].tobytes())
            f.write(uv[..., 1].tobytes())

    planes = list(read_video_frames(path, ingest="yuv420"))
    assert len(planes) == 2 and isinstance(planes[0], tuple)
    assert planes[0][0].shape == (h, w) and planes[0][1].shape == (h // 2, w // 2, 2)

    model = FakeBlobDetectionModel(confidence_threshold=0.5)
    out = predict_video(
        detection_model=model,
        source=path,
        slice_height=64,
        slice_width=64,
        no_standard_prediction=True,
        project=str(tmp_path / "runs"),
        verbose=0,
        ingest="yuv420",
    )
    assert out["num_frames"] == 2
    import json, os
    dets = json.load(open(os.path.join(out["export_dir"], "result.json")))
    assert len(dets) == 2
