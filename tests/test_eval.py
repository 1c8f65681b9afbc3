import json

import numpy as np
import pytest

from facedet_tpu.data.widerface import (
    FaceAnnotation,
    convert_widerface_to_coco,
    convert_widerface_to_yolo,
    fix_prediction_file,
    parse_wider_gt_txt,
)
from facedet_tpu.eval.bbox_overlaps import bbox_overlaps, bbox_overlaps_numpy
from facedet_tpu.eval.dual import (
    DualWiderFaceEvaluator,
    average_precision_11pt,
    calculate_iou,
)
from facedet_tpu.eval.subcategory import (
    CATEGORIES,
    build_subcategory_gt,
    check_image_category,
    classify_face,
    create_subcategory_annotations,
    find_images_by_category,
)
from facedet_tpu.eval.widerface_official import evaluate_setting, voc_ap

GT_TXT = """0--Parade/0_Parade_1.jpg
2
10 10 20 20 0 0 0 0 0 0
100 100 200 180 1 0 1 0 2 1
1--Other/1_Other_1.jpg
0
0 0 0 0 0 0 0 0 0 0
2--More/2_More_1.jpg
1
5 5 60 60 0 0 0 1 0 0
"""


def test_parse_gt_txt(tmp_path):
    p = tmp_path / "gt.txt"
    p.write_text(GT_TXT)
    ann = parse_wider_gt_txt(str(p))
    assert len(ann) == 3
    assert len(ann["0--Parade/0_Parade_1.jpg"]) == 2
    assert ann["1--Other/1_Other_1.jpg"] == []
    f = ann["0--Parade/0_Parade_1.jpg"][1]
    assert f.blur == 1 and f.occlusion == 2 and f.pose == 1
    assert ann["2--More/2_More_1.jpg"][0].invalid == 1


def test_bbox_overlaps_native_matches_numpy():
    rng = np.random.default_rng(3)
    a = rng.uniform(0, 100, (20, 2))
    a = np.concatenate([a, a + rng.uniform(5, 40, (20, 2))], -1)
    b = rng.uniform(0, 100, (9, 2))
    b = np.concatenate([b, b + rng.uniform(5, 40, (9, 2))], -1)
    got = bbox_overlaps(a, b)
    want = bbox_overlaps_numpy(a, b)
    np.testing.assert_allclose(got, want, atol=1e-10)
    # identical boxes -> IoU 1 (inclusive +1 convention)
    same = np.array([[0.0, 0.0, 10.0, 10.0]])
    assert bbox_overlaps(same, same)[0, 0] == pytest.approx(1.0)


def test_voc_ap_simple():
    # perfect: precision 1 at all recalls
    assert voc_ap(np.array([0.5, 1.0]), np.array([1.0, 1.0])) == pytest.approx(1.0)
    # recall caps at 0.5 with precision 1 -> AP 0.5
    assert voc_ap(np.array([0.25, 0.5]), np.array([1.0, 1.0])) == pytest.approx(0.5)


def _mk_setting(preds, gts, keeps=None):
    predictions = {"ev": {"img": np.asarray(preds, float).reshape(-1, 5)}}
    facebox = {"ev": {"img": np.asarray(gts, float).reshape(-1, 4)}}
    keep = None if keeps is None else {"ev": {"img": np.asarray(keeps, int)}}
    return predictions, facebox, keep


def test_evaluate_setting_perfect():
    gts = [[10, 10, 20, 20], [100, 100, 30, 30]]
    preds = [[10, 10, 20, 20, 0.9], [100, 100, 30, 30, 0.8]]
    ap, recall, precision = evaluate_setting(*_mk_setting(preds, gts))
    assert ap == pytest.approx(1.0, abs=1e-6)
    assert recall.max() == pytest.approx(1.0)


def test_evaluate_setting_missed_gt():
    gts = [[10, 10, 20, 20], [100, 100, 30, 30]]
    preds = [[10, 10, 20, 20, 0.9]]
    ap, recall, _ = evaluate_setting(*_mk_setting(preds, gts))
    assert ap == pytest.approx(0.5, abs=1e-6)


def test_evaluate_setting_ignore():
    # GT2 not in keep list: a pred matching it is marked ignored, not FP
    gts = [[10, 10, 20, 20], [100, 100, 30, 30]]
    preds = [[10, 10, 20, 20, 0.9], [100, 100, 30, 30, 0.8]]
    ap, _, _ = evaluate_setting(*_mk_setting(preds, gts, keeps=[1]))
    assert ap == pytest.approx(1.0, abs=1e-6)
    # whereas a genuine FP ranked above the TP does hurt precision
    preds_fp = [[500, 500, 30, 30, 0.95], [10, 10, 20, 20, 0.9]]
    ap_fp, _, _ = evaluate_setting(*_mk_setting(preds_fp, gts, keeps=[1]))
    assert ap_fp == pytest.approx(0.5, abs=1e-6)


def test_classify_face_rules():
    mk = lambda w, h, **kw: FaceAnnotation((0, 0, w, h), **kw)
    assert classify_face(mk(30, 40)) == "small_clear"
    assert classify_face(mk(60, 40)) == "medium_clear"
    assert classify_face(mk(200, 40)) == "large_clear"
    assert classify_face(mk(200, 40, blur=2)) == "large_degraded"
    assert classify_face(mk(60, 40, occlusion=1)) == "medium_degraded"
    assert classify_face(mk(30, 30, illumination=1)) == "small_degraded"
    assert classify_face(mk(30, 30, pose=1)) == "small_degraded"
    assert classify_face(mk(30, 30, invalid=1)) is None
    assert classify_face(mk(0, 30)) is None


def test_subcategory_pipeline(tmp_path):
    gt = tmp_path / "gt.txt"
    gt.write_text(GT_TXT)
    out = build_subcategory_gt(str(gt), str(tmp_path / "sub.json"))
    data, stats = out["data"], out["statistics"]
    assert stats["total_images"] == 3
    assert stats["invalid_faces"] == 1
    entry = data["0--Parade/0_Parade_1.jpg"]
    assert entry["all_faces"][0]["category"] == "small_clear"
    assert entry["all_faces"][1]["category"] == "large_degraded"
    info = check_image_category(data, "0--Parade/0_Parade_1.jpg")
    assert info["found"] and info["categories"]["small_clear"] == 1
    hits = find_images_by_category(data, "large_degraded")
    assert hits == [("0--Parade/0_Parade_1.jpg", 1)]
    assert json.load(open(tmp_path / "sub.json"))


def test_dual_evaluator_synthetic():
    sub_gt = {
        "a.jpg": {
            "all_faces": [
                {"bbox": [10, 10, 200, 200], "category": "large_clear"},
                {"bbox": [300, 300, 40, 40], "category": "small_clear"},
            ],
            **{c: [] for c in CATEGORIES},
        }
    }
    sub_gt["a.jpg"]["large_clear"] = [0]
    sub_gt["a.jpg"]["small_clear"] = [1]

    def predict(path):
        return np.array([[10, 10, 200, 200, 0.9], [300, 300, 40, 40, 0.6]])

    ev = DualWiderFaceEvaluator(predict, sub_gt, output_dir="/tmp/dual_out")
    res = ev.run(save=False)
    by_cat = {r["category"]: r for r in res["subcategory_results"]}
    assert by_cat["large_clear"]["ap"] == pytest.approx(1.0)
    assert by_cat["small_clear"]["ap"] == pytest.approx(1.0)
    assert by_cat["medium_clear"]["total_gt"] == 0
    by_diff = {r["category"]: r for r in res["difficulty_results"]}
    assert by_diff["easy"]["total_gt"] == 1
    assert by_diff["hard"]["total_gt"] == 2
    assert by_diff["hard"]["f1_score"] == pytest.approx(1.0)
    # cache: one inference for all 9 passes
    assert len(ev.prediction_cache) == 1


def test_iou_matrix_matches_scalar():
    from facedet_tpu.eval.dual import iou_matrix_xywh

    rng = np.random.default_rng(3)
    a = np.concatenate(
        [rng.uniform(0, 100, (12, 2)), rng.uniform(0.0, 50, (12, 2))], axis=1
    )
    b = np.concatenate(
        [rng.uniform(0, 100, (9, 2)), rng.uniform(0.0, 50, (9, 2))], axis=1
    )
    a[0, 2:] = 0.0  # degenerate zero-area box
    m = iou_matrix_xywh(a, b)
    for i in range(a.shape[0]):
        for j in range(b.shape[0]):
            assert m[i, j] == pytest.approx(calculate_iou(a[i], b[j]), abs=1e-12)
    assert iou_matrix_xywh(np.zeros((0, 4)), b).shape == (0, 9)


def test_dual_matcher_parity_vs_pairwise_oracle():
    """The vectorised greedy matcher must reproduce the reference's per-pair
    loop (eval/eval_dual.py:376-409) exactly on random scenes."""
    rng = np.random.default_rng(7)
    for trial in range(5):
        n_gt, n_ign, n_pred = rng.integers(0, 6), rng.integers(0, 4), rng.integers(1, 12)
        mk = lambda n: np.concatenate(
            [rng.uniform(0, 80, (n, 2)), rng.uniform(5, 40, (n, 2))], axis=1
        )
        gts, igns, preds = mk(n_gt), mk(n_ign), mk(n_pred)
        # half the preds sit ON a gt/ignored box to force threshold crossings
        for i in range(n_pred // 2):
            pool = [g for g in list(gts) + list(igns)]
            if pool:
                preds[i] = pool[int(rng.integers(len(pool)))] + rng.normal(0, 2, 4)
        conf = rng.uniform(0.05, 0.99, n_pred)
        sub_gt = {
            "img.jpg": {
                "all_faces": [
                    {"bbox": list(map(float, g)), "category": "large_clear"} for g in gts
                ]
                + [{"bbox": list(map(float, g)), "category": "small_clear"} for g in igns],
            }
        }
        pred_rows = np.concatenate([preds, conf[:, None]], axis=1)
        ev = DualWiderFaceEvaluator(lambda p: pred_rows, sub_gt, output_dir="/tmp/dual_out")
        got = ev.evaluate_single_set("large_clear", ["large_clear"])

        # per-pair oracle (the reference's exact loop)
        gt_matched = [False] * n_gt
        dets = []
        for pi in np.argsort(-conf, kind="stable"):
            best_iou, best_idx = 0.0, -1
            for gi, g in enumerate(gts):
                iou = calculate_iou(preds[pi], g)
                if iou > best_iou:
                    best_iou, best_idx = iou, gi
            if best_iou >= 0.5 and best_idx != -1 and not gt_matched[best_idx]:
                gt_matched[best_idx] = True
                dets.append({"confidence": conf[pi], "is_tp": True})
            elif not any(calculate_iou(preds[pi], g) >= 0.5 for g in igns):
                dets.append({"confidence": conf[pi], "is_tp": False})
        want_ap = average_precision_11pt(dets, n_gt)
        assert got["ap"] == pytest.approx(want_ap, abs=1e-9), f"trial {trial}"
        assert got["true_positives"] == sum(
            1 for d in dets if d["is_tp"] and d["confidence"] >= 0.25
        )
        assert got["false_negatives"] == sum(1 for m in gt_matched if not m)


def test_ap11_and_iou():
    assert calculate_iou([0, 0, 10, 10], [0, 0, 10, 10]) == pytest.approx(1.0)
    assert calculate_iou([0, 0, 10, 10], [20, 20, 5, 5]) == 0.0
    dets = [{"confidence": 0.9, "is_tp": True}, {"confidence": 0.8, "is_tp": True}]
    assert average_precision_11pt(dets, 2) == pytest.approx(1.0)
    assert average_precision_11pt([], 2) == 0.0


def test_converters(tmp_path):
    gt = tmp_path / "gt.txt"
    gt.write_text(GT_TXT)
    sizes = {
        "0--Parade/0_Parade_1.jpg": (400, 400),
        "1--Other/1_Other_1.jpg": (100, 100),
        "2--More/2_More_1.jpg": (80, 80),
    }
    stats = convert_widerface_to_yolo(
        str(gt), str(tmp_path), str(tmp_path / "labels"), image_sizes=sizes
    )
    assert stats["images"] == 3 and stats["labels"] == 2  # invalid face skipped
    lbl = (tmp_path / "labels" / "0--Parade_0_Parade_1.txt").read_text().splitlines()
    assert len(lbl) == 2
    cls, cx, cy, w, h = lbl[0].split()
    assert cls == "0" and float(cx) == pytest.approx(20 / 400) and float(w) == pytest.approx(0.05)

    cstats = convert_widerface_to_coco(
        str(gt), str(tmp_path), str(tmp_path / "coco.json"), image_sizes=sizes
    )
    coco = json.load(open(tmp_path / "coco.json"))
    assert cstats["annotations"] == 2  # invalid face dropped, zero-size kept out
    assert coco["categories"] == [{"id": 0, "name": "face"}]


def test_fix_prediction_file(tmp_path):
    p = tmp_path / "pred.txt"
    p.write_text("img_1\n1 2 3 4 0.9\n5 6 7 8 0.8\n")
    assert fix_prediction_file(str(p)) is True
    lines = p.read_text().splitlines()
    assert lines[1] == "2"
    assert fix_prediction_file(str(p)) is False  # idempotent
