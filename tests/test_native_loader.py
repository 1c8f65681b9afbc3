import numpy as np
import pytest

from facedet_tpu.data.native_loader import (
    load_image,
    load_image_native,
    prefetch_images,
)
from facedet_tpu.utils.viz import save_image


@pytest.fixture()
def jpgs(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(4):
        img = rng.integers(0, 255, (40 + i * 8, 60, 3), dtype=np.uint8)
        p = str(tmp_path / f"im{i}.jpg")
        save_image(p, img, quality=100)
        paths.append(p)
    return paths


def test_native_decode_matches_pil(jpgs):
    from PIL import Image

    native = load_image_native(jpgs[0])
    assert native is not None, "native decoder unavailable"
    pil = np.asarray(Image.open(jpgs[0]).convert("RGB"))
    assert native.shape == pil.shape
    # JPEG decoders may differ by small IDCT rounding
    assert np.mean(np.abs(native.astype(int) - pil.astype(int))) < 2.0


def test_load_image_fallback_png(tmp_path):
    p = str(tmp_path / "x.png")
    save_image(p, np.zeros((10, 12, 3), np.uint8))
    img = load_image(p)  # PNG -> PIL fallback path
    assert img.shape == (10, 12, 3)


def test_prefetch_order(jpgs):
    out = list(prefetch_images(jpgs, num_workers=2, window=3))
    assert [p for p, _ in out] == jpgs
    for i, (_, img) in enumerate(out):
        assert img is not None and img.shape == (40 + i * 8, 60, 3)


def test_prefetch_missing_file(tmp_path):
    out = list(prefetch_images([str(tmp_path / "missing.jpg")]))
    assert out[0][1] is None
