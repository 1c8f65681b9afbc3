"""Reference-golden recovery harness (tools/reference_goldens.py) and the
parity scorer (eval/reference_parity.py), on synthetic run artifacts."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from facedet_tpu.eval.reference_parity import (
    compare_image,
    match_detections,
    run_parity,
)
from facedet_tpu.tools.reference_goldens import (
    extract_goldens,
    extract_image_goldens,
    locate_crop,
    parse_crop_name,
)


def textured(h, w, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, (h, w, 3), np.uint8)
    # smooth a bit so JPEG doesn't destroy it
    f = img.astype(np.float32)
    f = (f + np.roll(f, 1, 0) + np.roll(f, 1, 1) + np.roll(f, 2, 0)) / 4
    return f.astype(np.uint8)


def test_parse_crop_name():
    assert parse_crop_name("x.jpg_face_3_conf_0.77.jpg") == (3, 0.77)
    assert parse_crop_name("x_face_12_conf_0.50.png") == (12, 0.5)
    assert parse_crop_name("temp_sahi_input.jpg") is None


def test_locate_crop_exact():
    img = textured(200, 300)
    crop = img[40:90, 120:180]
    x, y, ncc = locate_crop(img, crop)
    assert (x, y) == (120, 40)
    assert ncc > 0.99


def test_locate_crop_survives_jpeg(tmp_path):
    img = textured(160, 240, seed=2)
    crop = img[30:80, 50:110]
    p = str(tmp_path / "c.jpg")
    Image.fromarray(crop).save(p, quality=90)
    crop_j = np.asarray(Image.open(p).convert("RGB"))
    x, y, ncc = locate_crop(img, crop_j)
    assert (x, y) == (50, 30)
    assert ncc > 0.9


def test_locate_crop_rejects_foreign_crop():
    img = textured(160, 240, seed=3)
    foreign = textured(50, 60, seed=99)
    _x, _y, ncc = locate_crop(img, foreign)
    assert ncc < 0.5  # caller's min_ncc filter drops it


def make_ref_dir(root, name, img, boxes_confs, extra_foreign=0):
    d = os.path.join(root, name)
    os.makedirs(os.path.join(d, "crops"), exist_ok=True)
    Image.fromarray(img).save(os.path.join(d, "temp_sahi_input.jpg"), quality=95)
    for i, ((x1, y1, x2, y2), conf) in enumerate(boxes_confs, 1):
        Image.fromarray(img[y1:y2, x1:x2]).save(
            os.path.join(d, "crops", f"{name}_face_{i}_conf_{conf:.2f}.jpg"),
            quality=92,
        )
    for i in range(extra_foreign):  # e.g. crops cut from an enhanced variant
        Image.fromarray(textured(40, 40, seed=1000 + i)).save(
            os.path.join(d, "crops", f"{name}_face_{90+i}_conf_0.40.jpg")
        )
    return d


def test_extract_image_goldens_end_to_end(tmp_path):
    img = textured(180, 260, seed=5)
    boxes = [((20, 30, 80, 95), 0.83), ((150, 100, 230, 170), 0.61)]
    d = make_ref_dir(str(tmp_path), "image_t", img, boxes, extra_foreign=1)
    g = extract_image_goldens(d, min_ncc=0.8)
    assert g["image_hw"] == [180, 260]
    assert g["skipped_crops"] == 1
    got = sorted(tuple(f["bbox"]) for f in g["faces"])
    want = sorted(b for b, _c in boxes)
    assert len(got) == 2
    for gb, wb in zip(got, want):
        assert max(abs(a - b) for a, b in zip(gb, wb)) <= 1, (gb, wb)


def test_match_and_compare_metrics():
    golden = {
        "faces": [
            {"bbox": [10, 10, 50, 50], "conf_lo": 0.8, "conf_hi": 0.9},
            {"bbox": [100, 100, 160, 150], "conf_lo": 0.6, "conf_hi": 0.6},
        ]
    }
    dets = [
        ([11, 11, 49, 52], 0.85),   # matches face 1, conf inside range
        ([101, 98, 158, 149], 0.75),  # matches face 2, conf off by 0.15
        ([200, 200, 220, 220], 0.9),  # false positive
    ]
    r = compare_image(golden, dets, iou_thr=0.5)
    assert r["matched"] == 2 and r["golden_faces"] == 2 and r["predicted"] == 3
    assert r["recall"] == 1.0 and r["precision"] == pytest.approx(2 / 3)
    assert r["mean_conf_delta"] == pytest.approx((0.0 + 0.15) / 2)
    # greedy matcher is 1:1
    pairs = match_detections(
        np.array([f["bbox"] for f in golden["faces"]], np.float32),
        np.array([d[0] for d in dets], np.float32),
    )
    assert len(pairs) == 2 and len({p[1] for p in pairs}) == 2


def test_run_parity_with_fake_detector(tmp_path):
    """End-to-end: synthetic reference artifacts -> goldens JSON -> pipeline
    run -> aggregated report (the flow a real-weights parity check uses)."""
    from facedet_tpu.engine.fake import FakeBlobDetectionModel

    img = np.zeros((160, 200, 3), np.uint8)
    img[48:53, 68:73] = 255  # one bright blob the fake detector will find
    # golden box roughly around the blob
    make_ref_dir(str(tmp_path), "image_blob", img, [((58, 38, 83, 63), 0.50)])
    goldens = extract_goldens(str(tmp_path), min_ncc=0.5)
    assert "image_blob" in goldens["images"]
    model = FakeBlobDetectionModel(confidence_threshold=0.3)
    report = run_parity(
        goldens,
        str(tmp_path),
        model,
        conf=0.3,
        operating_point=dict(
            slice_height=64, slice_width=64, perform_standard_pred=False
        ),
    )
    assert report["recall"] is not None
    assert "image_blob" in report["images"]


def test_committed_goldens_asset_is_wellformed():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "facedet_tpu",
        "eval",
        "assets",
        "reference_goldens.json",
    )
    with open(path) as f:
        g = json.load(f)
    assert len(g["images"]) >= 10
    total = 0
    for name, im in g["images"].items():
        h, w = im["image_hw"]
        for face in im["faces"]:
            x1, y1, x2, y2 = face["bbox"]
            assert 0 <= x1 < x2 <= w and 0 <= y1 < y2 <= h, (name, face)
            # conf 0.00 is legitimate: the parade dirs came from a conf-0.01
            # eval run whose crop names round scores to 2 decimals
            assert 0.0 <= face["conf_lo"] <= face["conf_hi"] <= 1.0
            assert face["ncc"] >= 0.85
            total += 1
    assert total >= 150


import os as _os
import pytest as _pytest


@_pytest.mark.skipif(
    not _os.path.exists("/root/reference/temp_streamlit"),
    reason="reference artifacts not present",
)
def test_discovery_covers_both_artifact_dirs():
    """extract_goldens' candidate walk must find all 16 committed artifact
    dirs across temp_streamlit/ (which hides its subdirs behind a stray
    top-level temp_sahi_input.jpg) AND temp_streamlit_batch/ — regression for
    the short-circuit that dropped the 10 temp_streamlit images."""
    import json

    from facedet_tpu.tools.reference_goldens import discover_artifact_dirs

    candidates = discover_artifact_dirs("/root/reference")
    with open(
        _os.path.join(
            _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
            "facedet_tpu", "eval", "assets", "reference_goldens.json",
        )
    ) as f:
        committed = set(json.load(f)["images"])
    assert committed <= set(candidates)
