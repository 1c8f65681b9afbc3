import json
import os

import numpy as np

from facedet_tpu.engine.fake import FakeBlobDetectionModel
from facedet_tpu.eval.widerface_official import OfficialWiderFaceEvaluator


def make_image(h, w, dots):
    img = np.zeros((h, w, 3), np.uint8)
    for y, x in dots:
        img[y - 1 : y + 2, x - 1 : x + 2] = 255
    return img


def test_official_evaluator_end_to_end(tmp_path):
    # synthetic 2-image "dataset": GT boxes centered on the bright dots
    dots = {"ev_a/img1": [(30, 40)], "ev_a/img2": [(60, 80)]}
    gt_lines = []
    for path, ds in dots.items():
        gt_lines.append(path + ".jpg")
        gt_lines.append(str(len(ds)))
        for y, x in ds:
            gt_lines.append(f"{x - 5} {y - 5} 10 10 0 0 0 0 0 0")
    gt_txt = tmp_path / "gt.txt"
    gt_txt.write_text("\n".join(gt_lines) + "\n")

    images = {
        f"{k.split('/')[0]}/{k.split('/')[1]}": make_image(100, 120, v)
        for k, v in dots.items()
    }

    def loader(path):
        key = "/".join(path.replace("\\", "/").split("/")[-2:]).replace(".jpg", "")
        return images.get(key)

    model = FakeBlobDetectionModel(confidence_threshold=0.5, image_size=64)
    ev = OfficialWiderFaceEvaluator(
        model,
        images_path=str(tmp_path / "imgs"),
        gt_txt=str(gt_txt),
        use_sahi=True,
        sahi_config={"slice_height": 64, "slice_width": 64, "overlap_ratio": 0.2},
        inference_confidence=0.4,
        output_dir=str(tmp_path / "out"),
        image_loader=loader,
        perform_standard_pred=False,
    )
    assert "SAHI" in ev.mode_string
    results = ev.run()
    assert results["aps"]["all"] == 1.0, results["aps"]
    assert results["images_per_second"] > 0
    assert os.path.exists(tmp_path / "out" / "official_eval_results.json")
    saved = json.load(open(tmp_path / "out" / "official_eval_results.json"))
    assert saved["aps"]["all"] == 1.0


def test_evaluator_adaptive_and_standard_modes(tmp_path):
    img = make_image(90, 110, [(40, 50)])
    gt_txt = tmp_path / "gt.txt"
    gt_txt.write_text("ev/only.jpg\n1\n45 35 10 10 0 0 0 0 0 0\n")
    for kwargs in (
        {"use_sahi": True, "slicing_strategy": "adaptive"},
        {"use_sahi": False},
    ):
        # letterbox at native size in both modes so the fake detector's
        # fixed-radius box stays exactly on the GT box (any rescale turns the
        # full-image pass into a near-tie FP that the official 1000-threshold
        # grid cannot separate above score 0.999)
        model = FakeBlobDetectionModel(confidence_threshold=0.5, image_size=None)
        ev = OfficialWiderFaceEvaluator(
            model,
            images_path="",
            gt_txt=str(gt_txt),
            inference_confidence=0.4,
            output_dir=str(tmp_path / "out"),
            image_loader=lambda p: img,
            perform_standard_pred=False,
            **kwargs,
        )
        results = ev.run(save=False)
        assert results["aps"]["all"] > 0.99, (kwargs, results["aps"])


def test_recompile_storm_rehearsal_eval_scale(tmp_path):
    """SURVEY.md §7: no recompilation storm across a WIDERFACE-like
    mixed-resolution eval sweep. 300 images over a realistic size histogram
    must compile at most once per (canvas-bucket x tile-bucket) combination,
    not once per unique resolution."""
    import numpy as np

    from facedet_tpu.ops.tiler import (
        bucket_image_dim,
        bucket_tile_count,
        compute_slice_grid,
    )

    rng = np.random.default_rng(0)
    size_groups = [
        (100, 120), (140, 200), (220, 180), (300, 260), (180, 420), (260, 520),
    ]
    sizes = [size_groups[int(rng.integers(len(size_groups)))] for _ in range(300)]
    # jitter within each group: different exact resolutions, same buckets
    sizes = [(h + int(rng.integers(0, 8)), w + int(rng.integers(0, 8))) for h, w in sizes]

    gt_lines = []
    images = {}
    for i, (h, w) in enumerate(sizes):
        y, x = int(rng.integers(10, h - 10)), int(rng.integers(10, w - 10))
        key = f"ev_s/img{i}"
        images[key] = make_image(h, w, [(y, x)])
        gt_lines += [key + ".jpg", "1", f"{x - 5} {y - 5} 10 10 0 0 0 0 0 0"]
    gt_txt = tmp_path / "gt.txt"
    gt_txt.write_text("\n".join(gt_lines) + "\n")

    def loader(path):
        key = "/".join(path.replace("\\", "/").split("/")[-2:]).replace(".jpg", "")
        return images.get(key)

    model = FakeBlobDetectionModel(confidence_threshold=0.5, image_size=64)
    ev = OfficialWiderFaceEvaluator(
        model,
        images_path=str(tmp_path / "imgs"),
        gt_txt=str(gt_txt),
        use_sahi=True,
        sahi_config={"slice_height": 64, "slice_width": 64, "overlap_ratio": 0.2},
        inference_confidence=0.4,
        output_dir=str(tmp_path / "out"),
        image_loader=loader,
        perform_standard_pred=False,
    )
    results = ev.run(save=False)
    assert results["aps"]["all"] > 0.95, results["aps"]

    # analytic bucket count for this image set
    buckets = set()
    for h, w in sizes:
        grid = compute_slice_grid(h, w, 64, 64, 0.2, 0.2)
        buckets.add(
            (
                bucket_image_dim(grid.padded_h),
                bucket_image_dim(grid.padded_w),
                bucket_tile_count(grid.num_tiles),
            )
        )
    compiles = sum(
        entry["single"]._cache_size() for entry in model._fused_cache.values()
    )
    assert compiles <= len(buckets), (compiles, len(buckets), sorted(buckets))
    # and the bucket count itself stays tiny vs 300 unique-ish resolutions
    assert len(buckets) <= 12, sorted(buckets)


def test_invalid_flag_faces_are_ignore_regions(tmp_path):
    """GT faces written with invalid=1 (e.g. the reference's conf-0.01 eval
    dust in tools/golden_official_eval.py) are official ignore regions: a
    model that never finds them still scores AP 1.0, and detections landing
    on them are not counted as false positives."""
    from facedet_tpu.data.widerface import (
        gt_txt_to_keep_lists,
        parse_wider_gt_txt,
    )

    dots = [(30, 40)]
    img = make_image(100, 120, dots)
    # one real (detectable) face + one invalid box in a dark corner the fake
    # blob model can never fire on
    gt_txt = tmp_path / "gt.txt"
    gt_txt.write_text(
        "ev/img1.jpg\n2\n35 25 10 10 0 0 0 0 0 0\n90 80 8 8 0 0 0 1 0 0\n"
    )
    keeps = gt_txt_to_keep_lists(parse_wider_gt_txt(str(gt_txt)))
    np.testing.assert_array_equal(keeps["ev"]["img1"], [1])

    model = FakeBlobDetectionModel(confidence_threshold=0.5, image_size=64)
    ev = OfficialWiderFaceEvaluator(
        model,
        images_path=str(tmp_path / "imgs"),
        gt_txt=str(gt_txt),
        use_sahi=True,
        sahi_config={"slice_height": 64, "slice_width": 64, "overlap_ratio": 0.2},
        inference_confidence=0.4,
        output_dir=str(tmp_path / "out"),
        image_loader=lambda path: img,
        perform_standard_pred=False,
    )
    results = ev.run(save=False)
    assert results["aps"]["all"] == 1.0, results["aps"]


def test_golden_layout_marks_subthreshold_faces_invalid(tmp_path):
    """build_widerface_layout writes invalid=1 for golden faces whose
    recorded confidence tops out below min_conf."""
    import PIL.Image

    from facedet_tpu.tools.golden_official_eval import build_widerface_layout

    ref = tmp_path / "ref" / "dir_a"
    ref.mkdir(parents=True)
    PIL.Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(
        ref / "temp_sahi_input.jpg"
    )
    goldens = {
        "images": {
            "dir_a": {
                "faces": [
                    {"bbox": [1, 1, 9, 9], "conf_lo": 0.6, "conf_hi": 0.8},
                    {"bbox": [12, 12, 18, 18], "conf_lo": 0.01, "conf_hi": 0.01},
                ]
            }
        }
    }
    _, gt_txt = build_widerface_layout(
        goldens, str(tmp_path / "ref"), str(tmp_path / "work"), min_conf=0.2
    )
    lines = open(gt_txt).read().splitlines()
    assert lines[1] == "2"
    assert lines[2].split()[7] == "0"  # valid face
    assert lines[3].split()[7] == "1"  # conf-0.01 dust -> ignore region


def test_official_evaluator_dct420s_ingest(tmp_path):
    """The eval loop can stream real JPEG files through the sparse
    coefficient ingest (native/loader path) and score identically."""
    import pytest

    from facedet_tpu.utils.viz import save_image

    dots = {"ev_a/img1": [(30, 40)], "ev_a/img2": [(60, 80)]}
    gt_lines = []
    for path, ds in dots.items():
        gt_lines.append(path + ".jpg")
        gt_lines.append(str(len(ds)))
        for y, x in ds:
            gt_lines.append(f"{x - 5} {y - 5} 10 10 0 0 0 0 0 0")
    gt_txt = tmp_path / "gt.txt"
    gt_txt.write_text("\n".join(gt_lines) + "\n")
    for key, ds in dots.items():
        ev_dir = tmp_path / "imgs" / key.split("/")[0]
        os.makedirs(ev_dir, exist_ok=True)
        save_image(str(ev_dir / (key.split("/")[1] + ".jpg")),
                   make_image(100, 120, ds), quality=95)

    model = FakeBlobDetectionModel(confidence_threshold=0.5, image_size=64)
    ev = OfficialWiderFaceEvaluator(
        model,
        images_path=str(tmp_path / "imgs"),
        gt_txt=str(gt_txt),
        use_sahi=True,
        sahi_config={"slice_height": 64, "slice_width": 64, "overlap_ratio": 0.2},
        inference_confidence=0.4,
        output_dir=str(tmp_path / "out"),
        perform_standard_pred=False,
        ingest="dct420s",
    )
    results = ev.run(save=False)
    assert results["aps"]["all"] == 1.0, results["aps"]

    # pixel-consuming modes must refuse non-rgb ingest loudly
    with pytest.raises(ValueError):
        OfficialWiderFaceEvaluator(
            model, images_path="", gt_txt=str(gt_txt),
            use_sahi=False, ingest="dct420s",
        )


def test_golden_dual_eval_subcategory_gt(tmp_path):
    """The dual-eval GT builder classifies recovered faces by size and by
    the variance-of-Laplacian blur flag (sharp texture -> clear, flat or
    tiny crops -> degraded), and the blur_fn hook rides the bbx_gt blur
    column (tools/golden_dual_eval.py, VERDICT r4 #5)."""
    import PIL.Image

    from facedet_tpu.tools.golden_dual_eval import (
        build_golden_subcategory_gt,
        laplacian_blur_flag,
    )

    rng = np.random.default_rng(0)
    img = np.full((256, 256, 3), 128, np.uint8)
    img[8:72, 8:72] = rng.integers(0, 256, (64, 64, 3))  # sharp large face
    # [100:160] region left flat -> blurred medium face
    ref = tmp_path / "ref" / "dir_a"
    ref.mkdir(parents=True)
    PIL.Image.fromarray(img).save(ref / "temp_sahi_input.jpg", quality=98)

    assert laplacian_blur_flag(img, (8, 8, 72, 72)) == 0       # sharp
    assert laplacian_blur_flag(img, (100, 100, 140, 140)) == 1  # flat
    assert laplacian_blur_flag(img, (0, 0, 5, 5)) == 1          # tiny

    goldens = {
        "images": {
            "dir_a": {
                "faces": [
                    {"bbox": [8, 8, 208, 208], "conf_hi": 0.9},     # large sharp
                    {"bbox": [100, 100, 160, 160], "conf_hi": 0.9},  # medium flat
                    {"bbox": [4, 4, 14, 14], "conf_hi": 0.05},       # ignore dust
                ]
            }
        }
    }
    _, data, stats = build_golden_subcategory_gt(
        goldens, str(tmp_path / "ref"), str(tmp_path / "work")
    )
    entry = data["golden/dir_a.jpg"]
    cats = [f["category"] for f in entry["all_faces"]]
    assert cats[0] == "large_clear"
    assert cats[1] == "medium_degraded"
    assert cats[2] is None  # invalid=1 dust drops out of every category
    assert stats["per_category"]["large_clear"]["count"] == 1
    assert stats["invalid_faces"] == 1
