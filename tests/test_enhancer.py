import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facedet_tpu.engine.enhancer import (
    FaceEnhancer,
    create_enhancement_summary,
    enhance_face_crops_batch,
    get_available_models,
    tiled_sr,
)
from facedet_tpu.models.rrdbnet import RRDBConfig, RRDBNet, pixel_unshuffle

TINY = RRDBConfig(num_feat=8, num_block=1, num_grow_ch=4, scale=4)


def test_pixel_unshuffle():
    x = jnp.arange(2 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 3)
    y = pixel_unshuffle(x, 2)
    assert y.shape == (2, 2, 2, 12)
    # first output pixel packs the 2x2 input block
    np.testing.assert_allclose(np.asarray(y[0, 0, 0, :3]), np.asarray(x[0, 0, 0]))


@pytest.mark.parametrize("scale,shape", [(4, (1, 8, 8, 3)), (2, (1, 8, 8, 3))])
def test_rrdbnet_shapes(scale, shape):
    cfg = RRDBConfig(num_feat=8, num_block=1, num_grow_ch=4, scale=scale)
    model = RRDBNet(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros(shape))
    out = model.apply(v, jnp.ones(shape) * 0.5)
    assert out.shape == (1, shape[1] * scale, shape[2] * scale, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_tiled_sr_exact_with_local_fn():
    # 3x3 mean filter + nearest 2x upsample: receptive field 1px <= tile_pad,
    # so tiled and whole-image execution must agree exactly.
    def fn(x):
        k = jnp.ones((3, 3, 3, 3)) / 9.0 * jnp.eye(3)[None, None]
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        b, h, w, c = y.shape
        y = jnp.broadcast_to(y[:, :, None, :, None, :], (b, h, 2, w, 2, c))
        return y.reshape(b, 2 * h, 2 * w, c)

    img = jax.random.uniform(jax.random.PRNGKey(1), (50, 70, 3))
    full = fn(img[None])[0]
    tiled = tiled_sr(fn, img, scale=2, tile=32, tile_pad=4)
    assert tiled.shape == full.shape == (100, 140, 3)
    # interior must be exact (image borders differ: reflect halo vs SAME-zero);
    # in particular the tile seams at 32/64 lie inside this region.
    np.testing.assert_allclose(
        np.asarray(tiled)[4:-4, 4:-4], np.asarray(full)[4:-4, 4:-4], atol=1e-5
    )


def test_enhancer_enhance_image_and_outscale():
    enh = FaceEnhancer(cfg=TINY, outscale=4, tile=0, half=False)
    img = (np.random.default_rng(0).uniform(0, 255, (12, 16, 3))).astype(np.uint8)
    out, dt = enh.enhance_image(img)
    assert out.shape == (48, 64, 3) and out.dtype == np.uint8
    out2, _ = enh.enhance_image(img, outscale=2)
    assert out2.shape == (24, 32, 3)
    info = enh.get_model_info()
    assert info["scale"] == 4 and info["num_params"] > 0


def test_enhancer_x2_odd_size():
    cfg = RRDBConfig(num_feat=8, num_block=1, num_grow_ch=4, scale=2)
    enh = FaceEnhancer(cfg=cfg, outscale=2, tile=0, half=False)
    img = np.zeros((11, 13, 3), np.uint8)  # odd dims need unshuffle padding
    out, _ = enh.enhance_image(img)
    assert out.shape == (22, 26, 3)


def test_crops_batch_and_summary(tmp_path):
    from facedet_tpu.utils.viz import save_image

    crops = tmp_path / "crops"
    outdir = tmp_path / "enhanced"
    crops.mkdir()
    for i in range(3):
        save_image(str(crops / f"face_{i}_conf_0.90.jpg"), np.full((10, 9, 3), 100, np.uint8))
    enh = FaceEnhancer(cfg=TINY, outscale=4, tile=0, half=False)
    stats = enhance_face_crops_batch(str(crops), str(outdir), enh)
    assert stats["total"] == 3 and stats["enhanced"] == 3 and stats["failed"] == 0
    report = create_enhancement_summary(stats, model_info=enh.get_model_info())
    assert "Enhanced: 3" in report
    assert len(list(outdir.iterdir())) == 3


def test_catalog():
    cat = get_available_models()
    assert cat["RealESRGAN_x4plus"]["num_block"] == 23
    assert cat["RealESRGAN_x2plus"]["scale"] == 2
    with pytest.raises(ValueError):
        FaceEnhancer(model_name="nope")


def test_golden_weights_resolve_by_catalog_name():
    """Catalog names pick up the committed golden-trained checkpoints (the
    analog of the reference's pretrained auto-download, utils/enhancer.py:99);
    a custom cfg stays random-init."""
    import os

    from facedet_tpu.engine.detector import load_params_npz
    from facedet_tpu.engine.enhancer import _golden_ckpt_path

    for name in ("RealESRGAN_x2plus", "RealESRGAN_x4plus"):
        ckpt = _golden_ckpt_path(name)
        assert ckpt is not None and os.path.exists(ckpt), name
        enh = FaceEnhancer(model_name=name, tile=0, half=False)
        want = load_params_npz(ckpt)
        got_leaf = enh.variables["params"]["conv_first"]["kernel"]
        want_leaf = want["params"]["conv_first"]["kernel"]
        np.testing.assert_array_equal(
            np.asarray(got_leaf, np.float32), np.asarray(want_leaf, np.float32)
        )
    # custom cfg: no auto-resolution (tests/benchmarks stay random + tiny)
    tiny = FaceEnhancer(cfg=TINY, outscale=4, tile=0, half=False)
    assert tiny.variables["params"]["conv_first"]["kernel"].shape[-1] == 8


def test_enhance_to_jpeg_coefficient_fetch(tmp_path):
    """enhance_to_jpeg fetches the SR output as device-encoded DCT
    coefficients and entropy-codes them natively into a real .jpg; pixels
    must match the raw-RGB fetch path to JPEG-q90 fidelity."""
    import numpy as np
    from PIL import Image

    from facedet_tpu.utils.viz import save_image

    rng = np.random.default_rng(3)
    img = np.clip(
        np.kron(rng.integers(40, 210, (5, 6, 3)), np.ones((8, 8, 1)))
        + rng.normal(0, 2, (40, 48, 3)),
        0, 255,
    ).astype(np.uint8)
    src = str(tmp_path / "in.jpg")
    save_image(src, img, quality=95)

    enh = FaceEnhancer(cfg=TINY, outscale=4, tile=0, half=False)
    out_jpg = str(tmp_path / "out_dct.jpg")
    assert enh.enhance_to_jpeg(src, out_jpg, quality=90)
    got = np.asarray(Image.open(out_jpg).convert("RGB"))
    assert got.shape == (160, 192, 3)

    ref, _ = enh.enhance_image(np.asarray(Image.open(src).convert("RGB")))
    err = np.abs(got.astype(float) - ref.astype(float))
    assert err.mean() < 4.0  # q90 quantization + 4:2:0 chroma only


def test_pack_sparse_bitmap_device_matches_numpy():
    """Device-side sparse-bitmap pack (fetch direction) must produce the
    numpy-reference bitmap/values; nnz reports overflow honestly."""
    import jax.numpy as jnp

    from facedet_tpu.ops.jpeg_dct import (
        pack_sparse_bitmap_device,
        unpack_sparse_bitmap_np,
    )

    rng = np.random.default_rng(11)
    flat = np.where(
        rng.random(4096) < 0.2, rng.integers(-127, 128, 4096), 0
    ).astype(np.int8)
    cap = 1024
    mask = flat != 0
    bm_ref = np.packbits(mask)
    vals_ref = np.zeros(cap, np.int8)
    vals_ref[: int(mask.sum())] = flat[mask]
    bm_d, vals_d, nnz = pack_sparse_bitmap_device(jnp.asarray(flat), cap)
    assert int(nnz) == int(mask.sum())
    np.testing.assert_array_equal(np.asarray(bm_d), bm_ref)
    np.testing.assert_array_equal(np.asarray(vals_d), vals_ref)
    rec = unpack_sparse_bitmap_np(np.asarray(bm_d), np.asarray(vals_d), flat.size)
    np.testing.assert_array_equal(rec, flat)
    # overflow: nnz must exceed the tiny cap so callers can fall back
    _, _, nnz2 = pack_sparse_bitmap_device(jnp.asarray(flat), 8)
    assert int(nnz2) > 8


def test_enhance_to_jpeg_sparse_fetch_matches_dense(tmp_path):
    """sparse=True (dct420s fetch wire) must write byte-compatible pixels
    with the dense coefficient fetch — transport only, zero fidelity cost."""
    from PIL import Image

    from facedet_tpu.utils.viz import save_image

    rng = np.random.default_rng(5)
    img = np.clip(
        np.kron(rng.integers(40, 210, (5, 6, 3)), np.ones((8, 8, 1)))
        + rng.normal(0, 2, (40, 48, 3)),
        0, 255,
    ).astype(np.uint8)
    src = str(tmp_path / "in.jpg")
    save_image(src, img, quality=95)

    enh = FaceEnhancer(cfg=TINY, outscale=4, tile=0, half=False)
    out_dense = str(tmp_path / "out_dense.jpg")
    out_sparse = str(tmp_path / "out_sparse.jpg")
    assert enh.enhance_to_jpeg(src, out_dense, quality=90)
    assert enh.enhance_to_jpeg(src, out_sparse, quality=90, sparse=True)
    a = np.asarray(Image.open(out_dense).convert("RGB"))
    b = np.asarray(Image.open(out_sparse).convert("RGB"))
    assert a.shape == b.shape == (160, 192, 3)
    np.testing.assert_array_equal(a, b)


def test_plan_tile_grid_budget_and_waste():
    from facedet_tpu.engine.enhancer import plan_tile_grid

    # the r4 bench shape: must be a single no-halo window (the fixed square
    # grid computed 4 x 420^2 = 1.79x the image pixels)
    assert plan_tile_grid(512, 768, 400, 10, 8) == (1, 1, 512, 768)
    budget = 8 * 420 * 420
    for h, w in [(512, 768), (1024, 1536), (2340, 4160), (400, 400), (50, 70)]:
        gh, gw, th, tw = plan_tile_grid(h, w, 400, 10, 8)
        win_h = th + (20 if gh > 1 else 0)
        win_w = tw + (20 if gw > 1 else 0)
        g = gh * gw
        assert min(8, g) * win_h * win_w <= budget
        assert gh * th >= h and gw * tw >= w
        # never worse than the legacy square plan's computed pixels
        lgh, lgw = -(-h // 400), -(-w // 400)
        legacy = lgh * lgw * 420 * 420 if (h > 400 or w > 400) else h * w
        n_chunks = -(-g // min(8, g))
        cost = n_chunks * min(8, g) * win_h * win_w
        assert cost <= max(legacy, h * w)


def test_tiled_sr_multi_tile_exact():
    # force a multi-tile plan with a tiny budget; 3x3 mean filter's 1px
    # receptive field <= tile_pad so seams must be exact
    def fn(x):
        k = jnp.ones((3, 3, 3, 3)) / 9.0 * jnp.eye(3)[None, None]
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        b, h, w, c = y.shape
        y = jnp.broadcast_to(y[:, :, None, :, None, :], (b, h, 2, w, 2, c))
        return y.reshape(b, 2 * h, 2 * w, c)

    from facedet_tpu.engine.enhancer import plan_tile_grid

    img = jax.random.uniform(jax.random.PRNGKey(2), (90, 120, 3))
    gh, gw, th, tw = plan_tile_grid(90, 120, tile=32, tile_pad=4,
                                    max_tiles_per_batch=2)
    assert gh * gw > 1  # the tiny budget actually forces tiling
    full = fn(img[None])[0]
    tiled = tiled_sr(fn, img, scale=2, tile=32, tile_pad=4,
                     max_tiles_per_batch=2)
    assert tiled.shape == full.shape == (180, 240, 3)
    np.testing.assert_allclose(
        np.asarray(tiled)[8:-8, 8:-8], np.asarray(full)[8:-8, 8:-8], atol=1e-5
    )


def test_cascade_arm_matches_two_single_passes():
    """The x4cascade arm (x2 net applied twice inside one jitted pipeline,
    eval/assets/sr_x4cascade_report.json) must equal two explicit x2 passes
    and carry outscale/resize semantics like any other arm."""
    cfg = RRDBConfig(num_feat=8, num_block=1, num_grow_ch=4, scale=2)
    single = FaceEnhancer(cfg=cfg, outscale=2, tile=0, half=False)
    casc = FaceEnhancer(cfg=cfg, outscale=4, tile=0, half=False, cascade=True)
    casc.variables = single.variables  # same random init
    img = (np.random.default_rng(3).uniform(0, 255, (12, 16, 3))).astype(np.uint8)
    once, _ = single.enhance_image(img)
    twice, _ = single.enhance_image(once)
    got, _ = casc.enhance_image(img)
    assert got.shape == (48, 64, 3)
    # uint8 round-trip between the two single passes costs <= 1 lsb + net
    # amplification; the fused cascade skips it, so allow a small tolerance
    assert np.mean(np.abs(got.astype(int) - twice.astype(int))) < 3.0
    # outscale above s^2 resolves by resize AFTER the cascade
    out3, _ = casc.enhance_image(img, outscale=6)
    assert out3.shape == (72, 96, 3)
    info = casc.get_model_info()
    assert info["scale"] == 4 and info["net_scale"] == 2 and info["cascade"]


def test_cascade_alias_resolves_golden_x2():
    """RealESRGAN_x4cascade = catalog sugar: x2plus config + golden x2
    weights + cascade=True."""
    import os

    from facedet_tpu.engine.enhancer import _golden_ckpt_path

    ckpt = _golden_ckpt_path("RealESRGAN_x4cascade")
    assert ckpt is not None and os.path.basename(ckpt) == "rrdb_x2_golden.npz"
    enh = FaceEnhancer(model_name="RealESRGAN_x4cascade", tile=0, half=False)
    assert enh.cascade and enh.cfg.scale == 2 and enh.cfg.num_block == 23
    cat = get_available_models()
    assert cat["RealESRGAN_x4cascade"]["scale"] == 4
