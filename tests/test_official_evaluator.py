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
