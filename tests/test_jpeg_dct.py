"""Entropy-domain (quantized DCT) ingest: codec accuracy, device/host decode
parity, and end-to-end pipeline parity with the RGB path (ops/jpeg_dct.py —
the round-3 serving-bandwidth upgrade; BENCH.md ingest study)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from facedet_tpu.ops.color import rgb_to_yuv420  # noqa: E402
from facedet_tpu.ops.jpeg_dct import (  # noqa: E402
    DctImage,
    dct420_bytes,
    decode_dct420_np,
    decode_dct420_to_yuv_f32,
    encode_dct420,
    quality_tables,
)


def natural_image(h, w, seed=0):
    rng = np.random.default_rng(seed)
    base = np.kron(
        rng.standard_normal((h // 16 + 1, w // 16 + 1)).astype(np.float32),
        np.ones((16, 16), np.float32),
    )[:h, :w]
    base = base + 0.15 * rng.standard_normal((h, w)).astype(np.float32)
    base = (base - base.min()) / (base.max() - base.min())
    return np.stack([base * 255, base * 230 + 10, base * 210 + 25], -1).astype(
        np.uint8
    )


def test_quality_tables_monotone():
    q50y, q50c = quality_tables(50)
    q90y, q90c = quality_tables(90)
    assert (q90y <= q50y).all() and (q90c <= q50c).all()
    assert q90y.min() >= 1 and q50c.max() <= 255


def test_roundtrip_accuracy_q90():
    img = natural_image(96, 128)
    d = encode_dct420(img, quality=90)
    assert isinstance(d, DctImage) and d.hw == (96, 128)
    y, uv = decode_dct420_np(d)
    y_ref, uv_ref = rgb_to_yuv420(img)
    err = np.abs(y[:96, :128].astype(float) - y_ref.astype(float))
    assert err.mean() < 3.0  # JPEG-q90-grade luma fidelity
    cerr = np.abs(
        uv[: uv_ref.shape[0], : uv_ref.shape[1]].astype(float) - uv_ref.astype(float)
    )
    assert cerr.mean() < 3.0


def test_device_decode_matches_host():
    img = natural_image(64, 80, seed=3)
    d = encode_dct420(img, quality=85)
    y_np, uv_np = decode_dct420_np(d)
    y_dev, uv_dev = decode_dct420_to_yuv_f32(
        *(jnp.asarray(x) for x in (d.y_dc, d.y_ac, d.uv_dc, d.uv_ac, d.qy, d.qc))
    )
    # host rounds to uint8; device stays float — within the rounding step
    assert np.abs(np.asarray(y_dev) - y_np.astype(np.float32)).max() <= 0.51
    assert np.abs(np.asarray(uv_dev) - uv_np.astype(np.float32)).max() <= 0.51


def test_padding_is_black_luma_neutral_chroma():
    from facedet_tpu.engine.predict import _pad_dct_planes

    img = natural_image(40, 56, seed=5)
    d = encode_dct420(img, quality=90)
    planes = _pad_dct_planes(d, 128, 128)
    dec = decode_dct420_np(
        DctImage(planes[0], planes[1], planes[2], planes[3], d.qy, d.qc, (128, 128))
    )
    y, uv = dec
    assert y[100:, 100:].mean() < 6.0  # near-black padding
    assert abs(float(uv[40:, 40:].mean()) - 128.0) < 2.0  # neutral chroma


def test_pipeline_parity_rgb_vs_dct():
    from facedet_tpu.engine.fake import FakeBlobDetectionModel
    from facedet_tpu.engine.predict import get_sliced_prediction

    m = FakeBlobDetectionModel(confidence_threshold=0.5)
    img = np.zeros((100, 120, 3), np.uint8)
    img[29:32, 39:42] = 255
    img[69:72, 89:92] = 255
    r_rgb = get_sliced_prediction(img, m, slice_height=64, slice_width=64)
    r_dct = get_sliced_prediction(
        encode_dct420(img, quality=95), m,
        slice_height=64, slice_width=64, input_format="dct420",
    )
    ba = np.array([p.bbox.to_xyxy() for p in r_rgb.object_prediction_list])
    bb = np.array([p.bbox.to_xyxy() for p in r_dct.object_prediction_list])
    assert len(ba) == len(bb) == 2
    np.testing.assert_allclose(ba, bb, atol=1.0)
    assert r_dct.image.shape == (100, 120, 3)


def test_batched_stream_dct():
    from facedet_tpu.engine.fake import FakeBlobDetectionModel
    from facedet_tpu.engine.predict import predict_stream_batched

    m = FakeBlobDetectionModel(confidence_threshold=0.5)
    img = np.zeros((100, 120, 3), np.uint8)
    img[29:32, 39:42] = 255
    stream = [encode_dct420(img, quality=95) for _ in range(3)]
    n = 0
    for batch in predict_stream_batched(
        stream, m, batch_size=2, slice_height=64, slice_width=64,
        input_format="dct420",
    ):
        for res in batch:
            assert len(res.object_prediction_list) == 1
            n += 1
    assert n == 3


def test_bytes_accounting():
    # 1.53 B/px: 64 int8 AC + 2B DC per 8x8 luma block + chroma at quarter res
    b = dct420_bytes(1024, 1536)
    assert b == 1024 * 1536 * 66 // 64 + (1024 // 16) * (1536 // 16) * 2 * 66
    assert b < 1024 * 1536 * 3  # well under the RGB canvas


def test_native_file_coefficients_match_libjpeg_decode(tmp_path):
    """load_image_dct420 reads the file's stored coefficients via libjpeg's
    jpeg_read_coefficients (native/jpeg_decoder.cpp::jpeg_read_dct420);
    decoding them with this module's float IDCT must match libjpeg's own
    pixel decode (raw-data YUV path, same file) to IDCT rounding (+-1)."""
    from PIL import Image

    from facedet_tpu.data.native_loader import (
        load_image_dct420,
        load_image_yuv420,
    )

    img = natural_image(97, 133, seed=3)
    path = str(tmp_path / "f.jpg")
    Image.fromarray(img).save(path, quality=90, subsampling=2)  # 4:2:0

    d = load_image_dct420(path)
    assert isinstance(d, DctImage) and d.hw == (97, 133)
    assert d.y_dc.shape == (14, 18)  # ceil(97/16)*2, ceil(133/16)*2
    # PIL writes IJG q90 tables -> must round-trip exactly
    qy, qc = quality_tables(90)
    np.testing.assert_array_equal(d.qy, qy)
    np.testing.assert_array_equal(d.qc, qc)
    assert np.all(d.y_ac[..., 0] == 0)  # DC slot zeroed in AC planes

    ref = load_image_yuv420(path)
    assert isinstance(ref, tuple)  # native 4:2:0 raw decode available
    y, uv = decode_dct420_np(d)
    h, w = d.hw
    dy = np.abs(y[:h, :w].astype(int) - ref[0].astype(int))
    duv = np.abs(
        uv[: (h + 1) // 2, : (w + 1) // 2].astype(int) - ref[1].astype(int)
    )
    assert dy.max() <= 2 and dy.mean() < 0.2
    assert duv.max() <= 2 and duv.mean() < 0.2


def test_native_file_coefficients_fallback_non420(tmp_path):
    """Non-4:2:0 files (PIL subsampling=0) take the documented fallback:
    RGB decode + encode_dct420, still producing a usable DctImage."""
    from PIL import Image

    from facedet_tpu.data.native_loader import load_image_dct420

    img = natural_image(64, 80, seed=5)
    path = str(tmp_path / "f444.jpg")
    Image.fromarray(img).save(path, quality=95, subsampling=0)
    d = load_image_dct420(path)
    assert isinstance(d, DctImage) and d.hw == (64, 80)
    y, uv = decode_dct420_np(d)
    yy, _ = rgb_to_yuv420(img)
    assert np.abs(y[:64, :80].astype(int) - yy.astype(int)).mean() < 6.0


def test_native_file_coefficients_overflow_fallback(tmp_path):
    """High-quality files whose stored AC coefficients exceed the int8 wire
    range must NOT be silently clipped: the native reader returns -6 and the
    loader falls back to RGB decode + q90 re-encode (detectable by the quant
    tables: the fallback writes IJG q90 tables, a q100 file carries ~all-1s)."""
    from PIL import Image

    from facedet_tpu.data.native_loader import load_image_dct420

    rng = np.random.default_rng(7)
    img = (rng.integers(0, 2, (64, 64, 1)) * 255).astype(np.uint8)
    img = np.repeat(img, 3, axis=2)  # checkerboard noise: huge AC energy
    path = str(tmp_path / "q100.jpg")
    Image.fromarray(img).save(path, quality=100, subsampling=2)
    d = load_image_dct420(path)
    assert isinstance(d, DctImage) and d.hw == (64, 64)
    qy90, _ = quality_tables(90)
    np.testing.assert_array_equal(d.qy, qy90)  # fallback path taken


def test_native_jpeg_writer_roundtrip(tmp_path):
    """save_dct420_jpeg entropy-codes DctImage planes into a real baseline
    JPEG (native jpeg_write_coefficients). Reloading the file returns
    bit-identical coefficients over every block covering real pixels (libjpeg
    replaces MCU dummy-padding blocks with duplicated-DC dummies — invisible
    in the decoded image), and third parties (PIL) can open it."""
    from PIL import Image

    from facedet_tpu.data.native_loader import (
        load_image_dct420,
        save_dct420_jpeg,
    )

    img = natural_image(100, 130, seed=9)
    d = encode_dct420(img, quality=90)
    path = str(tmp_path / "w.jpg")
    assert save_dct420_jpeg(path, d)

    d2 = load_image_dct420(path)
    assert d2.hw == (100, 130)
    np.testing.assert_array_equal(d.qy, d2.qy)
    rb, cb = -(-100 // 8), -(-130 // 8)  # real luma block dims
    np.testing.assert_array_equal(d.y_dc[:rb, :cb], d2.y_dc[:rb, :cb])
    np.testing.assert_array_equal(d.y_ac[:rb, :cb], d2.y_ac[:rb, :cb])
    rc_, cc_ = -(-50 // 8), -(-65 // 8)  # real chroma block dims
    np.testing.assert_array_equal(d.uv_dc[:rc_, :cc_], d2.uv_dc[:rc_, :cc_])
    np.testing.assert_array_equal(d.uv_ac[:rc_, :cc_], d2.uv_ac[:rc_, :cc_])
    assert np.asarray(Image.open(path).convert("RGB")).shape == (100, 130, 3)


def test_device_encoder_matches_host_encoder():
    """encode_dct420_device (the fetch-mirror FDCT) quantizes within one
    step of the host reference encoder and round-trips to the same pixels."""
    import jax
    import jax.numpy as jnp

    from facedet_tpu.ops.jpeg_dct import (
        encode_dct420_device,
        wire_planes_to_dct_image,
    )

    img = natural_image(96, 112, seed=4)
    qy, qc = quality_tables(90)
    host = encode_dct420(img, quality=90)
    *planes, n_clipped = jax.jit(
        lambda x: encode_dct420_device(x, jnp.asarray(qy), jnp.asarray(qc))
    )(jnp.asarray(img, jnp.float32) / 255.0)
    assert int(n_clipped) == 0  # natural image at q90: no wire overflow
    dev = wire_planes_to_dct_image(planes, qy, qc, (96, 112))
    assert np.abs(dev.y_ac.astype(int) - host.y_ac.astype(int)).max() <= 1
    assert np.abs(dev.y_dc.astype(int) - host.y_dc.astype(int)).max() <= 1
    y_d, _ = decode_dct420_np(dev)
    y_h, _ = decode_dct420_np(host)
    # one quant step on a large-q coefficient moves pixels by up to ~q/8
    assert np.abs(y_d.astype(int) - y_h.astype(int)).max() <= 16
    assert np.abs(y_d.astype(float) - y_h.astype(float)).mean() < 2.0


def test_sparse_ac_roundtrip():
    from facedet_tpu.ops.jpeg_dct import (
        pack_sparse_ac,
        sparse_cap_bucket,
        sparse_nnz_entries,
        unpack_sparse_ac,
        unpack_sparse_ac_np,
    )

    rng = np.random.default_rng(3)
    flat = np.where(
        rng.random(8192) < 0.12, rng.integers(-127, 128, 8192), 0
    ).astype(np.int8)
    cap = sparse_cap_bucket(sparse_nnz_entries(flat), flat.size)
    deltas, vals = pack_sparse_ac(flat, cap)
    assert deltas.size == vals.size == cap and deltas.dtype == np.uint16
    rec = np.asarray(unpack_sparse_ac(jnp.asarray(deltas), jnp.asarray(vals), flat.size))
    np.testing.assert_array_equal(rec, flat)
    np.testing.assert_array_equal(unpack_sparse_ac_np(deltas, vals, flat.size), flat)
    # capacity guard: packing more nonzeros than cap must fail loudly
    with pytest.raises(ValueError):
        pack_sparse_ac(np.ones(8192, np.int8), cap)


def test_sparse_ac_delta_overflow_and_edges():
    from facedet_tpu.ops.jpeg_dct import (
        pack_sparse_ac,
        sparse_nnz_entries,
        unpack_sparse_ac,
        unpack_sparse_ac_np,
    )

    # zero gaps longer than the uint16 delta range force dummy entries
    n = 200_000
    flat = np.zeros(n, np.int8)
    for pos, v in ((0, 5), (70_000, -3), (199_999, 7)):  # gaps straddle 65534
        flat[pos] = v
    entries = sparse_nnz_entries(flat)
    assert entries > 4  # dummies were counted
    deltas, vals = pack_sparse_ac(flat, entries)
    np.testing.assert_array_equal(unpack_sparse_ac_np(deltas, vals, n), flat)
    rec = np.asarray(unpack_sparse_ac(jnp.asarray(deltas), jnp.asarray(vals), n))
    np.testing.assert_array_equal(rec, flat)
    # all-zero input round-trips through the parking entry alone
    z = np.zeros(1024, np.int8)
    dz, vz = pack_sparse_ac(z, 8)
    np.testing.assert_array_equal(unpack_sparse_ac_np(dz, vz, z.size), z)
    np.testing.assert_array_equal(
        np.asarray(unpack_sparse_ac(jnp.asarray(dz), jnp.asarray(vz), z.size)), z
    )
    # zero padding after the parking entry must not clobber the last value
    tail = np.zeros(100, np.int8)
    tail[99] = 9
    dt, vt = pack_sparse_ac(tail, 64)
    np.testing.assert_array_equal(unpack_sparse_ac_np(dt, vt, 100), tail)


def test_pack_sparse_ac_batch_native_parity():
    """The native batch packer (native/sparse_pack.cpp) must emit the exact
    numpy wire: same capacity bucket, identical deltas/values, including
    >65534 zero-run dummies, empty images, and tail nonzeros."""
    from facedet_tpu.ops.jpeg_dct import (
        _load_pack_native,
        pack_sparse_ac,
        pack_sparse_ac_batch,
        sparse_cap_bucket,
        sparse_nnz_entries,
        unpack_sparse_ac_np,
    )

    rng = np.random.default_rng(11)
    total = 180_000
    flat2d = np.zeros((6, total), np.int8)
    flat2d[0] = np.where(  # photo-ish density
        rng.random(total) < 0.15, rng.integers(-127, 128, total), 0
    )
    flat2d[1, ::70_001] = 3  # dummy-entry gaps
    # row 2 stays empty (parking entry only)
    flat2d[3, total - 1] = -9  # tail nonzero
    flat2d[4, 0] = 1
    flat2d[5] = np.where(
        rng.random(total) < 0.003, rng.integers(-127, 128, total), 0
    )
    deltas, vals = pack_sparse_ac_batch(flat2d)
    nzs = [np.flatnonzero(flat2d[i]) for i in range(6)]
    cap = sparse_cap_bucket(
        max(sparse_nnz_entries(flat2d[i], nz=nzs[i]) for i in range(6)), total
    )
    assert deltas.shape == (6, cap)
    for i in range(6):
        d_ref, v_ref = pack_sparse_ac(flat2d[i], cap, nz=nzs[i])
        np.testing.assert_array_equal(deltas[i], d_ref)
        np.testing.assert_array_equal(vals[i], v_ref)
        np.testing.assert_array_equal(
            unpack_sparse_ac_np(deltas[i], vals[i], total), flat2d[i]
        )
    # this host must exercise the native path, not just the fallback
    assert _load_pack_native() is not None


def test_stage_batch_host_sparse_matches_dense():
    """dct420s staging (direct-to-flat views + batch pack) must reproduce the
    dense dct420 staging's AC bytes exactly, padding regions included."""
    from facedet_tpu.engine.predict import _stage_batch_host
    from facedet_tpu.ops.jpeg_dct import (
        encode_dct420,
        unpack_sparse_ac_np,
        wire_unpack_dct420s,
        wire_unpack_dct420s_np,
    )

    rng = np.random.default_rng(5)
    imgs = [
        encode_dct420(rng.integers(0, 255, (120, 200, 3)).astype(np.uint8))
        for _ in range(3)
    ]
    bh, bw = 128, 256  # force right/bottom padding
    y_dc_d, y_ac_d, uv_dc_d, uv_ac_d, qy_d, qc_d = _stage_batch_host(
        imgs, "dct420", bh, bw
    )
    wire = _stage_batch_host(imgs, "dct420s", bh, bw)
    assert wire.dtype == np.uint8 and wire.ndim == 1
    y_dc_s, uv_dc_s, qy_s, qc_s, deltas, vals = wire_unpack_dct420s_np(
        wire, 3, bh, bw
    )
    # the device bitcast unpack must agree with the host views bit-for-bit
    dev = wire_unpack_dct420s(jnp.asarray(wire), 3, bh, bw)
    for host, d in zip((y_dc_s, uv_dc_s, qy_s, qc_s, deltas, vals), dev):
        np.testing.assert_array_equal(host, np.asarray(d))
    np.testing.assert_array_equal(y_dc_d, y_dc_s)
    np.testing.assert_array_equal(uv_dc_d, uv_dc_s)
    np.testing.assert_array_equal(qy_d, qy_s)
    np.testing.assert_array_equal(qc_d, qc_s)
    total = y_ac_d[0].size + uv_ac_d[0].size
    for i in range(3):
        flat_ref = np.concatenate([y_ac_d[i].ravel(), uv_ac_d[i].ravel()])
        np.testing.assert_array_equal(
            unpack_sparse_ac_np(deltas[i], vals[i], total), flat_ref
        )


def test_sparse_cap_bucket_bounds():
    from facedet_tpu.ops.jpeg_dct import sparse_cap_bucket

    total = 1 << 20
    caps = {sparse_cap_bucket(n, total) for n in range(0, total, 4096)}
    # geometric bucketing: a handful of distinct capacities over the range
    assert len(caps) < 30
    for n in (0, 1, 4096, 65537, total - 1, total):
        assert sparse_cap_bucket(n, total) >= n
        assert sparse_cap_bucket(n, total) <= total


def test_pipeline_parity_dct_vs_sparse():
    from facedet_tpu.engine.fake import FakeBlobDetectionModel
    from facedet_tpu.engine.predict import get_sliced_prediction

    m = FakeBlobDetectionModel(confidence_threshold=0.5)
    img = natural_image(100, 120, seed=9)
    img[29:32, 39:42] = 255
    img[69:72, 89:92] = 255
    d = encode_dct420(img, quality=90)
    r_dense = get_sliced_prediction(
        d, m, slice_height=64, slice_width=64, input_format="dct420"
    )
    r_sparse = get_sliced_prediction(
        d, m, slice_height=64, slice_width=64, input_format="dct420s"
    )
    ba = np.array([p.bbox.to_xyxy() for p in r_dense.object_prediction_list])
    bb = np.array([p.bbox.to_xyxy() for p in r_sparse.object_prediction_list])
    assert ba.shape == bb.shape and len(ba) > 0
    np.testing.assert_allclose(ba, bb, atol=1e-3)
    assert r_sparse.image.shape == (100, 120, 3)


def test_batched_stream_sparse_parity():
    from facedet_tpu.engine.fake import FakeBlobDetectionModel
    from facedet_tpu.engine.predict import predict_stream_batched

    m = FakeBlobDetectionModel(confidence_threshold=0.5)
    imgs = []
    for i in range(3):
        img = natural_image(100, 120, seed=20 + i)
        img[29 + i : 32 + i, 39:42] = 255
        imgs.append(encode_dct420(img, quality=90))
    outs = {}
    for fmt in ("dct420", "dct420s"):
        outs[fmt] = [
            (np.asarray(b.boxes), np.asarray(b.valid))
            for b in predict_stream_batched(
                imgs, m, batch_size=2, raw=True,
                slice_height=64, slice_width=64, input_format=fmt,
            )
        ]
    for (ba, va), (bb, vb) in zip(outs["dct420"], outs["dct420s"]):
        np.testing.assert_array_equal(va, vb)
        np.testing.assert_allclose(ba * va[..., None], bb * vb[..., None], atol=1e-3)


def test_wide_ac_wire_roundtrip(tmp_path):
    """The int16 ("wide") AC fetch wire: extreme-contrast content that
    overflows the int8 wire encodes clean at wide_ac=True (clipped only at
    JPEG baseline's 1023 ceiling), survives the sparse bitmap pack at int16,
    and entropy-codes through the native wide writer into a real JPEG whose
    decoded pixels match the source. This is the serving fix for GAN-
    sharpened SR outputs that previously forced the pixel-fetch fallback
    (probe_sr_e2e)."""
    import jax
    import jax.numpy as jnp

    from facedet_tpu.data.native_loader import save_dct420_jpeg
    from facedet_tpu.ops.jpeg_dct import (
        encode_dct420_device,
        pack_sparse_bitmap_device,
        unpack_sparse_bitmap_np,
        wire_planes_to_dct_image,
    )

    # high-amplitude low-frequency content at quality 95: the low-freq quant
    # steps are ~2, so a full-swing sinusoid's AC coefficient is ~128*4/2 >>
    # 127 — exactly the sharpened-SR-output regime that clips the int8 wire
    img = natural_image(96, 112, seed=7).astype(np.float64)
    yy = np.arange(96)[:, None, None]
    img = img * 0.2 + (128.0 + 120.0 * np.cos(np.pi * (2 * yy + 1) / 16)) * 0.8
    img = np.clip(img, 0, 255).astype(np.uint8)
    qy, qc = quality_tables(95)
    x = jnp.asarray(img, jnp.float32) / 255.0

    *_, n_clipped_narrow = jax.jit(
        lambda v: encode_dct420_device(v, jnp.asarray(qy), jnp.asarray(qc))
    )(x)
    assert int(n_clipped_narrow) > 0  # int8 wire overflows on this content

    *planes, n_clipped = jax.jit(
        lambda v: encode_dct420_device(
            v, jnp.asarray(qy), jnp.asarray(qc), wide_ac=True
        )
    )(x)
    assert int(n_clipped) == 0
    y_dc, y_ac, uv_dc, uv_ac = planes
    assert y_ac.dtype == jnp.int16 and uv_ac.dtype == jnp.int16
    assert int(jnp.max(jnp.abs(y_ac))) > 127  # genuinely uses the width

    # sparse bitmap pack keeps the wide dtype end-to-end
    flat = jnp.concatenate([y_ac.reshape(-1), uv_ac.reshape(-1)])
    cap = (int(jnp.sum(flat != 0)) + 15) & ~7
    bitmap, vals, nnz = jax.jit(
        lambda f: pack_sparse_bitmap_device(f, cap)
    )(flat)
    assert vals.dtype == jnp.int16 and int(nnz) <= cap
    rec = unpack_sparse_bitmap_np(
        np.asarray(bitmap), np.asarray(vals), int(flat.shape[0])
    )
    assert rec.dtype == np.int16
    np.testing.assert_array_equal(rec, np.asarray(flat))

    # native wide writer -> real decodable JPEG with matching pixels
    d = wire_planes_to_dct_image(planes, qy, qc, (96, 112))
    assert d.y_ac.dtype == np.int16
    path = str(tmp_path / "wide.jpg")
    if not save_dct420_jpeg(path, d):
        pytest.skip("native jpeg writer unavailable")
    from PIL import Image

    dec = np.asarray(Image.open(path).convert("RGB"), np.int32)
    assert dec.shape == (96, 112, 3)
    # luma must survive: q95 + 4:2:0 chroma, compare against source luma
    luma = lambda a: a @ np.array([0.299, 0.587, 0.114])
    err = np.abs(luma(dec) - luma(img.astype(np.int32)))
    assert err.mean() < 6.0 and np.median(err) < 4.0
