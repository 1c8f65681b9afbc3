import jax
import jax.numpy as jnp
import numpy as np

from facedet_tpu.core.detections import Detections, batched_empty, concat_detections


def test_empty_and_count():
    d = Detections.empty(8)
    assert d.capacity == 8 and d.num_keypoints == 5
    assert int(d.count()) == 0


def test_from_arrays_pads_and_masks():
    d = Detections.from_arrays(
        boxes=[[0, 0, 10, 10], [5, 5, 9, 9]], scores=[0.9, 0.4], capacity=4
    )
    assert d.capacity == 4
    assert int(d.count()) == 2
    out = d.to_numpy()
    assert out["boxes"].shape == (2, 4)
    np.testing.assert_allclose(out["scores"], [0.9, 0.4])


def test_sort_and_filter():
    d = Detections.from_arrays(
        boxes=np.arange(12).reshape(3, 4), scores=[0.1, 0.9, 0.5], capacity=5
    )
    s = d.sort_by_score()
    np.testing.assert_allclose(np.asarray(s.scores[:3]), [0.9, 0.5, 0.1])
    assert bool(s.valid[2]) and not bool(s.valid[3])
    f = d.filter_score(0.45)
    assert int(f.count()) == 2


def test_is_pytree_and_jit():
    d = Detections.empty(4)

    @jax.jit
    def bump(det):
        return det.mask(det.scores >= 0.0)

    out = bump(d)
    assert out.capacity == 4


def test_concat_truncates_by_score():
    a = Detections.from_arrays([[0, 0, 1, 1]], [0.9], capacity=2)
    b = Detections.from_arrays([[1, 1, 2, 2], [2, 2, 3, 3]], [0.5, 0.95], capacity=2)
    c = concat_detections([a, b], capacity=2)
    out = c.to_numpy()
    np.testing.assert_allclose(out["scores"], [0.95, 0.9])


def test_batched_empty():
    d = batched_empty(3, 7)
    assert d.boxes.shape == (3, 7, 4) and d.valid.shape == (3, 7)
