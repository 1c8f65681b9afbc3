import jax.numpy as jnp
import numpy as np

from facedet_tpu.core.letterbox import (
    apply_letterbox,
    compute_letterbox,
    unletterbox_boxes,
    unletterbox_kpts,
)


def test_spec_geometry():
    spec = compute_letterbox(480, 640, 640)
    assert (spec.new_h, spec.new_w) == (480, 640)
    assert spec.scale == 1.0 and spec.pad_top == 80 and spec.pad_left == 0
    spec2 = compute_letterbox(100, 50, 200)
    assert spec2.new_h == 200 and spec2.new_w == 100
    assert spec2.pad_left == 50


def test_apply_and_invert():
    img = jnp.ones((100, 50, 3)) * 0.5
    spec = compute_letterbox(100, 50, 200)
    out = apply_letterbox(img, spec, pad_value=0.0)
    assert out.shape == (200, 200, 3)
    # content occupies [0:200, 50:150]
    assert float(out[100, 100, 0]) == 0.5
    assert float(out[100, 10, 0]) == 0.0
    # box in letterbox coords maps back
    boxes = jnp.array([[50.0, 0.0, 150.0, 200.0]])  # full content region
    back = unletterbox_boxes(boxes, spec)
    np.testing.assert_allclose(np.asarray(back[0]), [0, 0, 50, 100], atol=1e-5)
    kpts = jnp.array([[[100.0, 100.0, 0.9]]])
    kb = unletterbox_kpts(kpts, spec)
    np.testing.assert_allclose(np.asarray(kb[0, 0]), [25, 50, 0.9], atol=1e-5)
