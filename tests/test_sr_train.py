"""SR restoration training: degradation model, dataset builder, staged loop.

The reference never trains its enhancer (it downloads RealESRGAN weights,
utils/enhancer.py:99-156); train/sr_train.py supplies the training the
zero-egress rebuild needs. These tests run the full loop at toy scale on CPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from facedet_tpu.models.rrdbnet import RRDBConfig, RRDBNet
from facedet_tpu.train.sr_train import (
    build_sr_dataset,
    degrade_image,
    degrade_patch,
    make_sr_staged_loop,
    make_sr_train_step,
    psnr,
    sr_loss,
)


def _toy_images(n=3, size=96, seed=0):
    rng = np.random.default_rng(seed)
    imgs = []
    for _ in range(n):
        base = rng.integers(0, 256, (size // 8, size // 8, 3), np.uint8)
        imgs.append(np.kron(base, np.ones((8, 8, 1), np.uint8)))
    return imgs


def test_degrade_patch_shapes_and_range():
    rng = np.random.default_rng(0)
    hr = _toy_images(1, 64)[0]
    for scale in (2, 4):
        lr = degrade_patch(hr, rng, scale)
        assert lr.shape == (64 // scale, 64 // scale, 3)
        assert lr.dtype == np.uint8
    # degradation must actually lose information vs a clean downsample
    lr2 = degrade_patch(hr, np.random.default_rng(1), 2)
    assert lr2.std() > 0


def test_degrade_image_deterministic():
    hr = _toy_images(1, 64, seed=3)[0]
    a = degrade_image(hr, 2)
    b = degrade_image(hr, 2)
    assert a.shape == (32, 32, 3)
    np.testing.assert_array_equal(a, b)


def test_build_sr_dataset_with_face_bias():
    imgs = _toy_images(2, 96)
    boxes = [np.array([[10.0, 10.0, 40.0, 40.0]]), np.zeros((0, 4))]
    lr, hr = build_sr_dataset(imgs, 8, 48, 2, seed=1, face_boxes=boxes)
    assert lr.shape == (8, 24, 24, 3) and hr.shape == (8, 48, 48, 3)
    assert lr.dtype == hr.dtype == np.uint8
    with pytest.raises(ValueError):
        build_sr_dataset(imgs, 4, 512, 2)


def _tiny_model(scale=2):
    cfg = RRDBConfig(scale=scale, num_block=1, num_feat=16, num_grow_ch=8,
                     dtype="float32")
    model = RRDBNet(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3))
    )
    return model, variables


def test_sr_training_reduces_loss():
    model, variables = _tiny_model()
    tx = optax.adam(2e-3)
    opt_state = tx.init(variables)
    step = make_sr_train_step(model, tx)
    rng = np.random.default_rng(0)
    hr = rng.integers(0, 256, (4, 16, 16, 3)).astype(np.float32) / 255.0
    lr = hr[:, ::2, ::2]  # trivial downsample pair
    first = last = None
    for i in range(40):
        variables, opt_state, loss = step(variables, opt_state,
                                          jnp.asarray(lr), jnp.asarray(hr))
        if i == 0:
            first = float(loss)
        last = float(loss)
    assert last < first * 0.7, (first, last)


def test_staged_loop_matches_single_steps():
    """flip=False staged loop must be step-for-step identical to the plain
    jitted step on the same batch sequence (and EMA must track params)."""
    model, variables = _tiny_model()
    tx = optax.adam(1e-3)
    opt_state = tx.init(variables)
    rng = np.random.default_rng(1)
    n_staged, b = 3, 2
    hr_u8 = rng.integers(0, 256, (n_staged, b, 16, 16, 3), np.uint8)
    lr_u8 = hr_u8[:, :, ::2, ::2]

    # reference: 4 sequential single steps
    ref_vars, ref_opt = variables, opt_state
    step = make_sr_train_step(model, tx)
    for i in range(4):
        lr = jnp.asarray(lr_u8[i % n_staged], jnp.float32) / 255.0
        hr = jnp.asarray(hr_u8[i % n_staged], jnp.float32) / 255.0
        ref_vars, ref_opt, _ = step(ref_vars, ref_opt, lr, hr)

    run = make_sr_staged_loop(model, tx, steps_per_dispatch=4, flip=False,
                              ema_decay=0.5)
    got_vars, ema, _, loss = run(
        variables, variables, opt_state,
        jnp.asarray(lr_u8), jnp.asarray(hr_u8),
        jnp.int32(0), jax.random.PRNGKey(0),
    )
    for a, c in zip(jax.tree.leaves(ref_vars), jax.tree.leaves(got_vars)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-5)
    # EMA sits between the init and the final params
    p0 = jax.tree.leaves(variables)[0]
    pn = jax.tree.leaves(got_vars)[0]
    em = jax.tree.leaves(ema)[0]
    assert not np.allclose(em, p0) and not np.allclose(em, pn)
    assert np.isfinite(float(loss))


def test_staged_loop_flip_changes_aug_not_stability():
    model, variables = _tiny_model()
    tx = optax.adam(1e-3)
    opt_state = tx.init(variables)
    rng = np.random.default_rng(2)
    hr_u8 = rng.integers(0, 256, (2, 2, 16, 16, 3), np.uint8)
    lr_u8 = hr_u8[:, :, ::2, ::2]
    run = make_sr_staged_loop(model, tx, steps_per_dispatch=3, flip=True)
    v, ema, o, loss = run(variables, variables, opt_state,
                          jnp.asarray(lr_u8), jnp.asarray(hr_u8),
                          jnp.int32(0), jax.random.PRNGKey(7))
    assert np.isfinite(float(loss))


def test_sr_loss_and_psnr():
    a = jnp.zeros((2, 4, 4, 3))
    assert float(sr_loss(a, a)) == pytest.approx(1e-3, rel=1e-3)
    x = np.zeros((8, 8), np.uint8)
    assert psnr(x, x) == float("inf")
    y = x.copy()
    y[0, 0] = 255
    assert 0 < psnr(x, y) < 40


def test_sr_golden_tool_helpers():
    """Host-side helpers of the training CLI (no TPU, no golden files)."""
    from facedet_tpu.tools.sr_golden_train import (
        _size_category,
        collect_face_crops,
    )

    assert _size_category(30, 20) == "small"
    assert _size_category(60, 140) == "medium"
    assert _size_category(200, 40) == "large"
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (200, 300, 3), np.uint8)
    records = [
        {"name": "a", "image": img,
         "boxes": np.array([[20.0, 20.0, 80.0, 90.0], [0.0, 0.0, 4.0, 4.0]])},
        {"name": "b", "image": img,
         "boxes": np.array([[100.0, 50.0, 260.0, 198.0]])},
    ]
    crops = collect_face_crops(records, max_crops=4, min_side=20)
    assert 1 <= len(crops) <= 4
    for c in crops:
        assert c["crop"].ndim == 3 and c["crop"].size > 0
        assert c["category"] in ("small", "medium", "large")


def test_usm_sharpen_targets():
    """USM sharpening (Real-ESRGAN's GT recipe): edges get amplified, flat
    regions (below threshold) stay untouched, and build_sr_dataset applies it
    to HR targets only."""
    from facedet_tpu.train.sr_train import usm_sharpen

    img = np.full((32, 32, 3), 100, np.uint8)
    img[:, 16:] = 180  # a vertical edge
    sharp = usm_sharpen(img, weight=0.5, radius=2.0, threshold=10.0)
    # flat interiors unchanged
    assert (sharp[:, :8] == 100).all() and (sharp[:, 24:] == 180).all()
    # overshoot at the edge: darker on the dark side, brighter on the bright
    assert sharp[:, 12:16].min() < 100
    assert sharp[:, 16:20].max() > 180

    imgs = _toy_images(n=2, size=64)
    lr_plain, hr_plain = build_sr_dataset(imgs, 4, 32, 2, seed=1)
    lr_usm, hr_usm = build_sr_dataset(imgs, 4, 32, 2, seed=1, usm_weight=0.5)
    # same sampling: LR identical (degraded from the UNsharpened crop)
    np.testing.assert_array_equal(lr_plain, lr_usm)
    assert (hr_plain != hr_usm).any()
