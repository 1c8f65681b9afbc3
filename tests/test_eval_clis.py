"""End-to-end CLI tests for both evaluators using the fake detector family."""
import json
import os

import numpy as np
import pytest

from facedet_tpu.utils.viz import save_image


@pytest.fixture()
def mini_dataset(tmp_path):
    images = tmp_path / "images" / "0--Ev"
    images.mkdir(parents=True)
    gt_lines = []
    for j in range(2):
        img = np.zeros((100, 120, 3), np.uint8)
        y, x = 30 + 20 * j, 40 + 25 * j
        img[y - 1 : y + 2, x - 1 : x + 2] = 255
        save_image(str(images / f"im{j}.jpg"), img, quality=100)
        gt_lines += [f"0--Ev/im{j}.jpg", "1", f"{x - 5} {y - 5} 10 10 0 0 0 0 0 0"]
    gt_txt = tmp_path / "gt.txt"
    gt_txt.write_text("\n".join(gt_lines) + "\n")
    return tmp_path


def test_eval_official_cli(mini_dataset, tmp_path):
    from facedet_tpu.apps.eval_official import main

    out = main([
        "--images", str(mini_dataset / "images"),
        "--gt-txt", str(mini_dataset / "gt.txt"),
        "--family", "fake",
        "--conf", "0.4",
        "--slice", "64",
        "--no-standard-pred",
        "--output", str(tmp_path / "out"),
    ])
    # native-decoded JPEGs + fake blob detector: exact GT boxes -> AP 1.0
    assert out["aps"]["all"] == pytest.approx(1.0, abs=1e-6)
    assert os.path.exists(tmp_path / "out" / "official_eval_results.json")


def test_eval_dual_cli(mini_dataset, tmp_path):
    from facedet_tpu.apps.eval_dual_cli import main

    out = main([
        "--images", str(mini_dataset / "images"),
        "--gt-txt", str(mini_dataset / "gt.txt"),
        "--family", "fake",
        "--conf", "0.4",
        "--slice", "64",
        "--no-standard-pred",
        "--output", str(tmp_path / "out"),
    ])
    by_cat = {r["category"]: r for r in out["subcategory_results"]}
    assert by_cat["small_clear"]["total_gt"] == 2
    assert by_cat["small_clear"]["ap"] == pytest.approx(1.0, abs=1e-6)
    assert os.path.exists(tmp_path / "out" / "dual_eval_results.json")
