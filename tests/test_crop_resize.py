import jax
import jax.numpy as jnp
import numpy as np

from facedet_tpu.core.detections import Detections
from facedet_tpu.ops.crop_resize import crop_and_resize


def test_crop_square_box_exact():
    # 64x64 gradient image; crop the [16,16,48,48] square to 32 -> identity
    img = jnp.arange(64 * 64, dtype=jnp.float32).reshape(64, 64, 1)
    img = jnp.tile(img / img.max(), (1, 1, 3))
    crops = crop_and_resize(img, jnp.array([[16.0, 16.0, 48.0, 48.0]]), out_size=32)
    assert crops.shape == (1, 32, 32, 3)
    want = np.asarray(img[16:48, 16:48])
    np.testing.assert_allclose(np.asarray(crops[0]), want, atol=1e-4)


def test_crop_nonsquare_includes_context():
    # wide box 32x16 near the image bottom: the square window extends past the
    # image edge, so rows inside the image are content and rows beyond are zero
    img = jnp.ones((24, 64, 3))
    crops = crop_and_resize(img, jnp.array([[0.0, 8.0, 32.0, 24.0]]), out_size=32)
    c = np.asarray(crops[0])
    assert c[:15].mean() > 0.99  # box rows (8..24 of a 32-tall window)
    assert c[18:].mean() < 0.01  # beyond the image bottom -> zero


def test_crop_out_of_bounds_zero_padded():
    img = jnp.ones((32, 32, 3))
    crops = crop_and_resize(img, jnp.array([[-16.0, -16.0, 16.0, 16.0]]), out_size=32)
    c = np.asarray(crops[0])
    assert c[:15, :15].mean() < 0.01  # outside the image
    assert c[17:, 17:].mean() > 0.99


def test_enhance_detections_fused():
    from facedet_tpu.engine.enhancer import FaceEnhancer
    from facedet_tpu.models.rrdbnet import RRDBConfig

    enh = FaceEnhancer(
        cfg=RRDBConfig(num_feat=8, num_block=1, num_grow_ch=4, scale=4),
        outscale=4,
        tile=0,
        half=False,
    )
    img = jnp.zeros((64, 80, 3)).at[20:30, 30:42].set(1.0)
    det = Detections.from_arrays(
        boxes=[[28, 18, 44, 32], [0, 0, 10, 10]], scores=[0.9, 0.8], capacity=3
    )
    out = enh.enhance_detections(img, det, crop_size=16)
    assert out.shape == (3, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()
