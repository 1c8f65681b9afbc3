"""Golden fine-tune data machinery: window remap invariants, crop sampling,
deterministic split, and (when the reference artifacts are present) the real
golden-image dataset loading."""
import os

import numpy as np
import pytest

from facedet_tpu.tools.golden_finetune import (
    GOLDENS_PATH,
    REF_DIR,
    _remap_boxes,
    load_golden_dataset,
    sample_batch,
    sample_crop,
    split_records,
)

HAVE_REF = os.path.exists(os.path.join(REF_DIR, "temp_streamlit"))


def test_remap_inside_window_identity_scaled():
    boxes = np.array([[10.0, 20.0, 50.0, 60.0]], np.float32)
    out = _remap_boxes(boxes, x0=0, y0=0, win=100, out=200)
    np.testing.assert_allclose(out, [[20, 40, 100, 120]])


def test_remap_drops_mostly_outside_boxes():
    boxes = np.array(
        [[90.0, 90.0, 130.0, 130.0],   # 6.25% visible in [0,100)^2 -> drop
         [10.0, 10.0, 40.0, 40.0]],    # fully visible -> keep
        np.float32,
    )
    out = _remap_boxes(boxes, x0=0, y0=0, win=100, out=100)
    assert out.shape == (1, 4)
    np.testing.assert_allclose(out[0], [10, 10, 40, 40])


def test_remap_partial_visibility_threshold():
    # half-visible box straddling the right edge: kept at min_visible=0.4,
    # dropped at 0.6
    boxes = np.array([[80.0, 10.0, 120.0, 50.0]], np.float32)
    assert len(_remap_boxes(boxes, 0, 0, 100, 100, min_visible=0.4)) == 1
    assert len(_remap_boxes(boxes, 0, 0, 100, 100, min_visible=0.6)) == 0


def test_remap_window_offset():
    boxes = np.array([[150.0, 250.0, 190.0, 290.0]], np.float32)
    out = _remap_boxes(boxes, x0=100, y0=200, win=100, out=100)
    np.testing.assert_allclose(out, [[50, 50, 90, 90]])


def _fake_record(h=800, w=1000, n=5, seed=0):
    rng = np.random.default_rng(seed)
    boxes = []
    for _ in range(n):
        x1 = rng.uniform(0, w - 80)
        y1 = rng.uniform(0, h - 80)
        boxes.append([x1, y1, x1 + rng.uniform(20, 70), y1 + rng.uniform(20, 70)])
    return {
        "name": "fake",
        "image": rng.integers(0, 255, (h, w, 3), dtype=np.uint8),
        "boxes": np.array(boxes, np.float32),
    }


def test_sample_crop_shapes_and_ranges():
    rec = _fake_record()
    rng = np.random.default_rng(1)
    for _ in range(10):
        img, boxes, mask, kpts = sample_crop(rec, rng, out=320, max_boxes=16)
        assert img.shape == (320, 320, 3) and img.dtype == np.uint8
        assert boxes.shape == (16, 4) and mask.shape == (16,)
        assert kpts.shape == (16, 5, 3)
        live = boxes[mask]
        # anchored sampling guarantees the anchor face is mostly in-window
        assert mask.sum() >= 1
        assert (live >= 0).all() and (live <= 320).all()
        assert (live[:, 2] > live[:, 0]).all() and (live[:, 3] > live[:, 1]).all()


def test_sample_batch_stacks():
    recs = [_fake_record(seed=i) for i in range(3)]
    ims, bxs, mks, kps = sample_batch(recs, np.random.default_rng(0), batch=4,
                                      out=256, max_boxes=8)
    assert ims.shape == (4, 256, 256, 3)
    assert bxs.shape == (4, 8, 4) and mks.shape == (4, 8)
    assert kps.shape == (4, 8, 5, 3)


def test_split_records_disjoint_deterministic():
    recs = [{"name": f"r{i}"} for i in range(16)]
    train, held = split_records(recs)
    assert len(train) == 12 and len(held) == 4
    assert {r["name"] for r in train}.isdisjoint({r["name"] for r in held})
    train2, held2 = split_records(list(recs))
    assert [r["name"] for r in held] == [r["name"] for r in held2]


def test_half_npz_roundtrip(tmp_path):
    """save_params_npz(half=True) shrinks storage to f16 and load widens
    back to f32 with bounded rounding error; int arrays pass untouched."""
    from facedet_tpu.engine.detector import load_params_npz, save_params_npz

    rng = np.random.default_rng(0)
    v = {
        "params": {"w": rng.standard_normal((32, 32)).astype(np.float32)},
        "batch_stats": {"count": np.array([7], np.int32)},
    }
    p = str(tmp_path / "half.npz")
    save_params_npz(p, v, half=True)
    w = load_params_npz(p)
    assert np.asarray(w["params"]["w"]).dtype == np.float32
    assert np.asarray(w["batch_stats"]["count"]).dtype == np.int32
    np.testing.assert_allclose(w["params"]["w"], v["params"]["w"], atol=2e-3)
    assert int(w["batch_stats"]["count"][0]) == 7
    # missing parent directories are created (a 10-min TPU-trained EMA once
    # died on FileNotFoundError at the save)
    p2 = str(tmp_path / "no" / "such" / "dir" / "ckpt.npz")
    save_params_npz(p2, v)
    assert os.path.exists(p2)


GOLDEN_CKPT = os.path.join(
    os.path.dirname(GOLDENS_PATH), "yolo11n_golden.npz"
)


def test_committed_golden_checkpoint_loads():
    """The committed real-data checkpoint must stay loadable into the n-scale
    pose model tree (guards against architecture drift orphaning the asset)."""
    import jax.numpy as jnp

    from facedet_tpu.engine.detector import load_params_npz
    from facedet_tpu.models.yolov11 import YoloConfig, YoloV11
    import jax

    v = load_params_npz(GOLDEN_CKPT)
    m = YoloV11(YoloConfig(scale="n", num_classes=1, with_pose=True))
    ref = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref)
    got_shapes = jax.tree_util.tree_map(lambda a: a.shape, v)
    assert ref_shapes == got_shapes


@pytest.mark.skipif(not HAVE_REF, reason="reference artifacts not present")
def test_main_smoke(tmp_path):
    """End-to-end glue: 2 tiny train steps + parity on 1 image per split
    through the real sliced pipeline, report + checkpoint written."""
    from facedet_tpu.tools.golden_finetune import main

    report = main([
        "--steps", "2", "--batch", "2", "--size", "128", "--conf", "0.0",
        "--out-dir", str(tmp_path), "--max-parity-images", "1",
    ])
    assert os.path.exists(report["checkpoint"])
    assert os.path.exists(os.path.join(str(tmp_path), "parity_report.json"))
    for split in ("train_split", "held_out_split"):
        assert len(report[split]["images"]) == 1


@pytest.mark.skipif(not HAVE_REF, reason="reference artifacts not present")
def test_load_golden_dataset_real():
    records = load_golden_dataset(GOLDENS_PATH, REF_DIR)
    assert len(records) == 20  # round-3 unbounded mining
    total = sum(len(r["boxes"]) for r in records)
    assert total == 370  # conf>=0.2 training faces (of 1170 recovered)
    for r in records:
        h, w = r["image"].shape[:2]
        assert r["image"].dtype == np.uint8
        live = r["boxes"]
        assert (live[:, 0] < live[:, 2]).all() and (live[:, 1] < live[:, 3]).all()
        assert (live[:, 2] <= w + 1).all() and (live[:, 3] <= h + 1).all()


@pytest.mark.skipif(not HAVE_REF, reason="reference artifacts not present")
def test_official_eval_layout(tmp_path):
    """WIDERFACE-layout builder: 16 unique stems (the 3 cross-dir duplicate
    sources must not collide), 201 faces, txt round-trips through the
    official parser."""
    import json

    from facedet_tpu.data.widerface import parse_wider_gt_txt
    from facedet_tpu.tools.golden_official_eval import build_widerface_layout

    with open(GOLDENS_PATH) as f:
        goldens = json.load(f)
    images_path, gt_txt = build_widerface_layout(
        goldens, REF_DIR, str(tmp_path)
    )
    parsed = parse_wider_gt_txt(gt_txt)
    assert len(parsed) == 20
    assert sum(len(v) for v in parsed.values()) == 1170
    jpgs = os.listdir(os.path.join(images_path, "golden"))
    assert len(jpgs) == 20
    for key in parsed:
        event, stem = key.split("/", 1)
        assert event == "golden"
        assert stem in jpgs


def test_sample_mosaic_and_jitter():
    from facedet_tpu.tools.golden_finetune import (
        _photometric_jitter,
        sample_batch,
        sample_mosaic,
    )

    recs = [_fake_record(seed=i) for i in range(3)]
    rng = np.random.default_rng(2)
    img, boxes, mask, _kpts = sample_mosaic(recs, rng, out=320, max_boxes=32)
    assert img.shape == (320, 320, 3) and img.dtype == np.uint8
    live = boxes[mask]
    assert mask.sum() >= 1
    assert (live >= 0).all() and (live <= 320).all()
    assert (live[:, 2] > live[:, 0]).all() and (live[:, 3] > live[:, 1]).all()
    # quadrant boxes must stay inside their quadrant after the shift
    j = _photometric_jitter(img, rng)
    assert j.shape == img.shape and j.dtype == np.uint8
    ims, bxs, mks, _ = sample_batch(recs, rng, batch=4, out=256, max_boxes=8,
                                    mosaic_prob=1.0, jitter=True)
    assert ims.shape == (4, 256, 256, 3)
    for b, m in zip(bxs, mks):
        lv = b[m]
        assert (lv >= 0).all() and (lv <= 256).all()


def test_teacher_label_crops_shapes_and_topk():
    """The distillation labeller (VERDICT r2 #10) returns fixed-capacity
    pixel-xyxy boxes + mask, keeping the top-scoring detections per crop.
    Uses the committed golden checkpoint at conf 0: every crop fills to
    max_boxes; at conf 0.99 random-ish crops yield none."""
    from facedet_tpu.tools.golden_finetune import teacher_label_crops

    rng = np.random.default_rng(0)
    crops = rng.integers(0, 255, (3, 64, 64, 3), np.uint8)
    boxes, mask = teacher_label_crops(
        crops, GOLDEN_CKPT, conf=0.0, max_boxes=5, fwd_batch=2
    )
    assert boxes.shape == (3, 5, 4) and mask.shape == (3, 5)
    assert mask.all()  # conf 0 always fills the capacity
    assert (boxes[mask][:, 2:] >= boxes[mask][:, :2] - 1e-3).all()
    # decode doesn't clamp to the tile; boxes stay near the 64px crop
    assert boxes[mask].max() <= 64.0 * 1.25

    b2, m2 = teacher_label_crops(
        crops, GOLDEN_CKPT, conf=0.99, max_boxes=5, fwd_batch=4
    )
    assert not m2.any() and (b2 == 0).all()
