"""Golden-flow integration test: a synthetic mini-WIDERFACE dataset through
the full toolchain — GT parsing, subcategory classification, YOLO/COCO
conversion, official + dual evaluation, tuner, submission round-trip —
with the deterministic fake detector providing inference."""
import json
import os

import numpy as np
import pytest

from facedet_tpu.engine.fake import FakeBlobDetectionModel


@pytest.fixture(scope="module")
def mini_widerface(tmp_path_factory):
    root = tmp_path_factory.mktemp("mini_wf")
    rng = np.random.default_rng(7)
    events = {"0--Alpha": 2, "1--Beta": 1}
    gt_lines = []
    images = {}
    from facedet_tpu.utils.viz import save_image

    for event, n in events.items():
        os.makedirs(root / "images" / event, exist_ok=True)
        for j in range(n):
            name = f"{event.split('--')[1]}_{j}"
            h, w = 120 + 8 * j, 160
            img = np.zeros((h, w, 3), np.uint8)
            dots = [(int(rng.integers(20, h - 20)), int(rng.integers(20, w - 20)))]
            for y, x in dots:
                img[y - 1 : y + 2, x - 1 : x + 2] = 255
            save_image(str(root / "images" / event / f"{name}.jpg"), img, quality=100)
            images[f"{event}/{name}"] = (img, dots)
            gt_lines.append(f"{event}/{name}.jpg")
            gt_lines.append(str(len(dots)))
            for y, x in dots:
                # large_clear faces (>=150px impossible at this size; use size attrs)
                gt_lines.append(f"{x - 5} {y - 5} 10 10 0 0 0 0 0 0")
    gt_txt = root / "wider_face_val_bbx_gt.txt"
    gt_txt.write_text("\n".join(gt_lines) + "\n")
    return root, str(gt_txt), images


def test_full_flow(mini_widerface, tmp_path):
    root, gt_txt, images = mini_widerface
    from facedet_tpu.data.widerface import (
        convert_widerface_to_coco,
        convert_widerface_to_yolo,
        parse_wider_gt_txt,
    )
    from facedet_tpu.eval.subcategory import build_subcategory_gt
    from facedet_tpu.eval.submission import read_submission, write_submission
    from facedet_tpu.eval.widerface_official import OfficialWiderFaceEvaluator
    from facedet_tpu.eval.dual import DualWiderFaceEvaluator

    # 1. GT parse + subcategory classifier
    ann = parse_wider_gt_txt(gt_txt)
    assert len(ann) == 3
    sub = build_subcategory_gt(gt_txt, str(tmp_path / "subcategory_gt.json"))
    assert sub["statistics"]["total_faces"] == 3
    assert sub["statistics"]["per_category"]["small_clear"]["count"] == 3

    # 2. converters
    ystats = convert_widerface_to_yolo(
        gt_txt, str(root / "images"), str(tmp_path / "labels")
    )
    assert ystats["labels"] == 3 and ystats["missing_images"] == 0
    cstats = convert_widerface_to_coco(
        gt_txt, str(root / "images"), str(tmp_path / "coco.json")
    )
    assert cstats["annotations"] == 3

    # 3. official evaluation with the fake detector (native-loader IO)
    model = FakeBlobDetectionModel(confidence_threshold=0.4, image_size=None)
    ev = OfficialWiderFaceEvaluator(
        model,
        images_path=str(root / "images"),
        gt_txt=gt_txt,
        use_sahi=True,
        sahi_config={"slice_height": 64, "slice_width": 64, "overlap_ratio": 0.2},
        perform_standard_pred=False,
        inference_confidence=0.4,
        output_dir=str(tmp_path / "out"),
    )
    predictions = ev.run_inference_on_all_images()
    results = ev.run(predictions=predictions)
    assert results["aps"]["all"] == pytest.approx(1.0), results["aps"]

    # 4. submission round-trip feeds evaluate-only mode
    n = write_submission(predictions, str(tmp_path / "subm"))
    assert n == 3
    back = read_submission(str(tmp_path / "subm"))
    results2 = ev.run(predictions=back, save=False)
    assert results2["aps"]["all"] == pytest.approx(1.0)

    # 5. dual evaluation against the subcategory GT
    def predict_fn(img_path):
        key = "/".join(img_path.replace("\\", "/").split("/")[-2:]).replace(".jpg", "")
        ev_preds = predictions[key.split("/")[0]][key.split("/")[1]]
        return ev_preds

    dual = DualWiderFaceEvaluator(
        predict_fn,
        sub["data"],
        images_path="",
        output_dir=str(tmp_path / "out"),
        global_confidence=0.25,
    )
    dres = dual.run(save=False)
    by_cat = {r["category"]: r for r in dres["subcategory_results"]}
    assert by_cat["small_clear"]["ap"] == pytest.approx(1.0)
    by_diff = {r["category"]: r for r in dres["difficulty_results"]}
    assert by_diff["hard"]["total_gt"] == 3
    assert by_diff["easy"]["total_gt"] == 0  # no large_clear faces in mini set
