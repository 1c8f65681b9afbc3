import numpy as np
import pytest

from facedet_tpu.eval.iqa import (
    brisque,
    brisque_features,
    calculate_iqa_scores,
    fit_aggd,
    fit_ggd,
    fit_niqe_model,
    mscn_coefficients,
    niqe,
)


def natural_image(size=192, seed=1):
    rng = np.random.default_rng(seed)
    img = np.zeros((size, size))
    for octave, amp in ((4, 1.0), (16, 0.5), (64, 0.25)):
        up = np.kron(rng.standard_normal((octave, octave)), np.ones((size // octave, size // octave)))
        img += amp * up
    img = (img - img.min()) / (img.max() - img.min()) * 255
    return img


def test_mscn_statistics():
    img = natural_image()
    mscn = mscn_coefficients(img)
    # MSCN of naturalistic images is approximately zero-mean, unit-ish variance
    assert abs(mscn.mean()) < 0.3
    assert 0.05 < mscn.std() < 3.0


def test_ggd_fit_recovers_gaussian():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(100_000)
    alpha, sigma = fit_ggd(x)
    assert alpha == pytest.approx(2.0, abs=0.15)  # Gaussian => shape 2
    assert sigma == pytest.approx(1.0, abs=0.05)


def test_aggd_fit_symmetric():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(100_000)
    alpha, eta, sl, sr = fit_aggd(x)
    assert alpha == pytest.approx(2.0, abs=0.3)
    assert abs(eta) < 0.05
    assert sl == pytest.approx(sr, rel=0.05)


def test_brisque_features_shape():
    f = brisque_features(natural_image())
    assert f.shape == (36,)
    assert np.isfinite(f).all()


def test_niqe_orders_distortions():
    clean = natural_image(seed=2)
    rng = np.random.default_rng(3)
    noisy = np.clip(clean + rng.standard_normal(clean.shape) * 60, 0, 255)
    s_clean = niqe(clean)
    s_noisy = niqe(noisy)
    assert np.isfinite(s_clean) and np.isfinite(s_noisy)
    assert s_noisy > s_clean, (s_clean, s_noisy)


def test_brisque_orders_distortions():
    clean = natural_image(seed=4)
    flat = np.full_like(clean, 128.0)  # structureless = unnatural
    assert brisque(flat) > brisque(clean)


def test_custom_pristine_model_and_scores_dict():
    imgs = [natural_image(seed=s) for s in range(3)]
    model = fit_niqe_model(imgs)
    assert model["mu"].shape == (36,) and model["cov"].shape == (36, 36)
    scores = calculate_iqa_scores(imgs[0], model)
    assert set(scores) == {"niqe", "brisque"}
    # an image drawn from the pristine distribution scores low against it
    rng = np.random.default_rng(9)
    noisy = np.clip(imgs[0] + rng.standard_normal(imgs[0].shape) * 80, 0, 255)
    assert niqe(noisy, model) > scores["niqe"]


def test_rgb_input_accepted():
    rgb = np.stack([natural_image(seed=6)] * 3, -1).astype(np.uint8)
    assert np.isfinite(niqe(rgb))
