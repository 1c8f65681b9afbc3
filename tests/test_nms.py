import numpy as np
import pytest

from facedet_tpu.core.detections import Detections
from facedet_tpu.ops.nms import merge_detections, nms


def make(boxes, scores, classes=None, cap=None):
    return Detections.from_arrays(boxes, scores, classes=classes, capacity=cap or len(scores) + 2)


def test_nms_suppresses_overlaps():
    d = make(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
        [0.9, 0.8, 0.7],
    )
    out = nms(d, iou_threshold=0.5).to_numpy()
    np.testing.assert_allclose(out["scores"], [0.9, 0.7])


def test_nms_keeps_disjoint():
    d = make([[0, 0, 10, 10], [20, 20, 30, 30]], [0.5, 0.6])
    out = nms(d, 0.5).to_numpy()
    assert len(out["scores"]) == 2


def test_greedynmm_merges_union():
    # small box fully inside big one: IOS = 1 -> merged
    d = make([[0, 0, 100, 100], [10, 10, 20, 20], [200, 200, 210, 210]], [0.9, 0.8, 0.3])
    out = merge_detections(d, mode="GREEDYNMM", match_metric="IOS", match_threshold=0.5)
    o = out.to_numpy()
    assert len(o["scores"]) == 2
    np.testing.assert_allclose(o["boxes"][0], [0, 0, 100, 100])
    # union extends the keeper when the matched box pokes out
    d2 = make([[0, 0, 10, 10], [3, 3, 14, 18]], [0.9, 0.8])  # IOS = 0.49
    o2 = merge_detections(d2, "NMM", "IOS", 0.3).to_numpy()
    assert len(o2["scores"]) == 1
    np.testing.assert_allclose(o2["boxes"][0], [0, 0, 14, 18])
    np.testing.assert_allclose(o2["scores"][0], 0.9)


def test_chain_does_not_bridge():
    # b matches a (keeper); c matches b but not a -> c must survive as its own
    # keeper because matching is greedy against original coords.
    a = [0, 0, 10, 10]
    b = [6, 0, 16, 10]
    c = [13, 0, 23, 10]
    d = make([a, b, c], [0.9, 0.8, 0.7])
    out = merge_detections(d, "GREEDYNMM", "IOU", 0.2).to_numpy()
    assert len(out["scores"]) == 2
    np.testing.assert_allclose(out["scores"], [0.9, 0.7])


def test_class_aware_matching():
    d = make([[0, 0, 10, 10], [0, 0, 10, 10]], [0.9, 0.8], classes=[0, 1])
    agn = merge_detections(d, "NMS", "IOU", 0.5, class_agnostic=True).to_numpy()
    cls = merge_detections(d, "NMS", "IOU", 0.5, class_agnostic=False).to_numpy()
    assert len(agn["scores"]) == 1 and len(cls["scores"]) == 2


def test_keypoints_ride_through():
    d = Detections.from_arrays(
        [[0, 0, 10, 10], [1, 1, 11, 11]],
        [0.9, 0.8],
        kpts=np.stack([np.full((5, 3), 7.0), np.full((5, 3), 3.0)]),
        capacity=4,
    )
    out = merge_detections(d, "GREEDYNMM", "IOS", 0.5).to_numpy()
    assert len(out["scores"]) == 1
    np.testing.assert_allclose(out["kpts"][0], 7.0)  # keeper's keypoints kept


def test_invalid_rows_ignored():
    d = make([[0, 0, 10, 10]], [0.9], cap=8)
    out = merge_detections(d, "NMS", "IOU", 0.5)
    assert int(out.count()) == 1


def sequential_greedy_reference(boxes, scores, thr, metric="IOU", merge=False):
    """Literal sequential greedy NMS/NMM oracle (numpy)."""
    order = np.argsort(-scores, kind="stable")
    boxes = boxes[order].astype(float)
    alive = np.ones(len(scores), bool)
    kept_rows = []
    out_boxes = []
    for i in range(len(scores)):
        if not alive[i]:
            continue
        group = [i]
        for j in range(i + 1, len(scores)):
            if not alive[j]:
                continue
            b1, b2 = boxes[i], boxes[j]
            ix = max(0, min(b1[2], b2[2]) - max(b1[0], b2[0]))
            iy = max(0, min(b1[3], b2[3]) - max(b1[1], b2[1]))
            inter = ix * iy
            a1 = (b1[2] - b1[0]) * (b1[3] - b1[1])
            a2 = (b2[2] - b2[0]) * (b2[3] - b2[1])
            m = inter / (a1 + a2 - inter) if metric == "IOU" else inter / min(a1, a2)
            if m > thr:
                alive[j] = False
                group.append(j)
        kept_rows.append(i)
        g = boxes[group]
        out_boxes.append(
            np.concatenate([g[:, :2].min(0), g[:, 2:].max(0)]) if merge else boxes[i]
        )
    return np.array(out_boxes), np.sort(scores)[::-1][np.array(kept_rows)]


@pytest.mark.parametrize("mode,metric", [("NMS", "IOU"), ("GREEDYNMM", "IOS"), ("NMM", "IOU")])
def test_differential_vs_sequential_oracle(mode, metric):
    rng = np.random.default_rng(42)
    for trial in range(5):
        n = 40
        xy = rng.uniform(0, 60, (n, 2))
        wh = rng.uniform(4, 25, (n, 2))
        boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
        scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
        thr = 0.4
        det = Detections.from_arrays(boxes, scores, capacity=n)
        got = merge_detections(det, mode, metric, thr).to_numpy()
        want_boxes, want_scores = sequential_greedy_reference(
            boxes, scores, thr, metric, merge=(mode != "NMS")
        )
        np.testing.assert_allclose(got["scores"], want_scores, atol=1e-6)
        np.testing.assert_allclose(got["boxes"], want_boxes, atol=1e-4)


def test_bad_mode_raises():
    d = make([[0, 0, 1, 1]], [0.5])
    with pytest.raises(ValueError):
        merge_detections(d, mode="SOFTNMS")


def test_differential_large_scale():
    # dense 400-box scene: long suppression chains stress the fixpoint solver
    rng = np.random.default_rng(123)
    n = 400
    xy = rng.uniform(0, 150, (n, 2))
    wh = rng.uniform(5, 30, (n, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    det = Detections.from_arrays(boxes, scores, capacity=n)
    got = merge_detections(det, "NMS", "IOU", 0.45).to_numpy()
    want_boxes, want_scores = sequential_greedy_reference(boxes, scores, 0.45, "IOU")
    np.testing.assert_allclose(got["scores"], want_scores, atol=1e-6)
    np.testing.assert_allclose(got["boxes"], want_boxes, atol=1e-3)


def test_lsnms_aliases_nms():
    import jax.numpy as jnp

    from facedet_tpu.core.detections import Detections
    from facedet_tpu.ops.nms import merge_detections

    det = Detections.from_arrays(
        boxes=jnp.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], jnp.float32),
        scores=jnp.array([0.9, 0.8, 0.7]),
        capacity=8,
    )
    a = merge_detections(det, mode="LSNMS", match_metric="IOU", match_threshold=0.5)
    b = merge_detections(det, mode="NMS", match_metric="IOU", match_threshold=0.5)
    import numpy as np

    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    np.testing.assert_allclose(np.asarray(a.boxes), np.asarray(b.boxes))
