import jax.numpy as jnp
import numpy as np
import pytest

from facedet_tpu.core import boxes as B


def test_conversions_roundtrip():
    b = jnp.array([[10.0, 20.0, 50.0, 80.0], [0.0, 0.0, 1.0, 1.0]])
    np.testing.assert_allclose(B.xywh_to_xyxy(B.xyxy_to_xywh(b)), b, atol=1e-6)
    np.testing.assert_allclose(B.cxcywh_to_xyxy(B.xyxy_to_cxcywh(b)), b, atol=1e-6)
    xywh = B.xyxy_to_xywh(b)
    np.testing.assert_allclose(np.asarray(xywh[0]), [10, 20, 40, 60])


def test_area():
    b = jnp.array([[0.0, 0.0, 4.0, 5.0], [3.0, 3.0, 3.0, 9.0], [5.0, 5.0, 1.0, 1.0]])
    np.testing.assert_allclose(np.asarray(B.box_area(b)), [20.0, 0.0, 0.0])


def test_iou_matrix_against_naive():
    rng = np.random.default_rng(0)
    xy = rng.uniform(0, 100, (7, 2))
    wh = rng.uniform(1, 50, (7, 2))
    a = np.concatenate([xy, xy + wh], -1)
    xy = rng.uniform(0, 100, (5, 2))
    wh = rng.uniform(1, 50, (5, 2))
    b = np.concatenate([xy, xy + wh], -1)

    def naive_iou(p, q):
        ix = max(0.0, min(p[2], q[2]) - max(p[0], q[0]))
        iy = max(0.0, min(p[3], q[3]) - max(p[1], q[1]))
        inter = ix * iy
        ua = (p[2] - p[0]) * (p[3] - p[1]) + (q[2] - q[0]) * (q[3] - q[1]) - inter
        return inter / ua

    got = np.asarray(B.iou_matrix(jnp.asarray(a), jnp.asarray(b)))
    want = np.array([[naive_iou(p, q) for q in b] for p in a])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_ios_is_intersection_over_smaller():
    big = jnp.array([[0.0, 0.0, 100.0, 100.0]])
    small = jnp.array([[10.0, 10.0, 20.0, 20.0]])  # fully inside
    assert float(B.ios_matrix(big, small)[0, 0]) == pytest.approx(1.0)
    assert float(B.iou_matrix(big, small)[0, 0]) == pytest.approx(0.01)


def test_shift_clip_scale_union():
    b = jnp.array([[5.0, 5.0, 15.0, 25.0]])
    shifted = B.shift_boxes(b, 100, 200)
    np.testing.assert_allclose(np.asarray(shifted[0]), [105, 205, 115, 225])
    clipped = B.clip_boxes(jnp.array([[-5.0, -5.0, 500.0, 70.0]]), 50, 60)
    np.testing.assert_allclose(np.asarray(clipped[0]), [0, 0, 60, 50])
    np.testing.assert_allclose(np.asarray(B.scale_boxes(b, 0.5)[0]), [2.5, 2.5, 7.5, 12.5])
    u = B.union_boxes(jnp.array([0.0, 0.0, 10.0, 10.0]), jnp.array([5.0, -2.0, 12.0, 8.0]))
    np.testing.assert_allclose(np.asarray(u), [0, -2, 12, 10])


def test_pair_metric_dispatch():
    a = jnp.zeros((1, 4))
    with pytest.raises(ValueError):
        B.pair_metric_matrix(a, a, "DIOU")
