"""Quantized-DCT image ingest: entropy-domain upload, IDCT on the MXU.

The serving pipeline is host-link bound (BENCH.md: the tunneled TPU link
moves ~30-50 MB/s effective). YUV420 ingest (ops/color.py) already halves
bytes vs RGB; this module goes one step further up the JPEG stack: upload the
*quantized 8x8 DCT coefficients* — the representation JPEG files actually
store — and run dequantization + inverse DCT on device, where each block's
IDCT is two 8x8 matmuls that XLA maps straight onto the MXU and fuses into
the detector's input pipeline.

Why it wins on the wire: quantized AC coefficients are ~97% zeros for natural
images, so the link's transparent compressor (weak, but real — measured ~2x
on low-entropy data, BENCH.md round 3) moves them ~1.8x faster than YUV
planes of the same nominal size. Measured same-phase A/B: 8 images as YUV420
11.4 img/s-equivalent vs int8 DCT 20.4 (BENCH.md round-3 ingest study).

Layout per image (``DctImage``):
  y_dc  [Hb, Wb]        int16 — DC (exact; range +-1024/q exceeds int8)
  y_ac  [Hb, Wb, 64]    int8  — AC quantized, slot 0 zeroed, clip +-127
  uv_dc [Hb2, Wb2, 2]   int16
  uv_ac [Hb2, Wb2, 2, 64] int8
  qy/qc [64]            float32 quant tables (per-image — real JPEG files
                        carry their own tables; libjpeg's FDCT uses exactly
                        the orthonormal scaling used here, so file
                        coefficients are drop-in compatible)

Lossy-ness contract: encoding from raw RGB at ``quality`` (default 90) loses
exactly what a quality-90 JPEG save loses (plus rare AC clips at +-127);
when the source is already a JPEG decoded to coefficients, the path is
lossless relative to the file. The reference's own inputs are JPEGs
(temp_streamlit/*/temp_sahi_input.jpg), so this matches its data fidelity.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "DctImage",
    "quality_tables",
    "encode_dct420",
    "decode_dct420_to_yuv_f32",
    "encode_dct420_device",
    "wire_planes_to_dct_image",
    "dct420_bytes",
]

# IJG standard base tables (Annex K of the JPEG spec)
_BASE_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], np.float32)
_BASE_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], np.float32)


def _dct_matrix() -> np.ndarray:
    """Orthonormal type-II DCT matrix (8x8) — identical scaling to libjpeg's
    FDCT (jfdctint.c), so real-file coefficients decode with the same math."""
    n = 8
    k = np.arange(n)
    c = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    c[0] /= np.sqrt(2.0)
    return c.astype(np.float32)


_C = _dct_matrix()
# Fused IDCT basis: vec(C^T X C) = vec(X) @ kron(C, C).  One [N, 64] @ [64, 64]
# matmul tiles the MXU (K=64 of 128 lanes); the per-block 8x8 einsum form used
# 8 of 128 MXU rows/cols (~0.4% utilisation) and cost 0.78 ms/img on the
# profiled pipeline (tools/profile_stages.py).
_IDCT64 = np.kron(_C, _C).astype(np.float32)  # [(j,k), (i,l)] = C[j,i] * C[k,l]


def quality_tables(quality: int = 90) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling -> (luma [64], chroma [64]) float32 tables."""
    q = max(1, min(100, int(quality)))
    scale = 5000.0 / q if q < 50 else 200.0 - 2.0 * q
    def tbl(base):
        return np.clip(np.floor((base * scale + 50.0) / 100.0), 1.0, 255.0)
    return tbl(_BASE_LUMA).astype(np.float32), tbl(_BASE_CHROMA).astype(np.float32)


@dataclasses.dataclass
class DctImage:
    """One image as quantized 4:2:0 DCT planes + its true pixel size."""

    y_dc: np.ndarray
    y_ac: np.ndarray
    uv_dc: np.ndarray
    uv_ac: np.ndarray
    qy: np.ndarray
    qc: np.ndarray
    hw: tuple[int, int]


def _blockify(plane: np.ndarray) -> np.ndarray:
    """[H, W] (H, W % 8 == 0) -> [H/8, W/8, 8, 8]."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)


def _quantize_plane(plane: np.ndarray, q: np.ndarray):
    """Float plane (already level-shifted by -128) -> (dc int16, ac int8)."""
    blocks = _blockify(plane)
    coef = np.einsum("ij,byjk,lk->byil", _C, blocks, _C)
    cq = np.round(coef.reshape(*coef.shape[:2], 64) / q)
    dc = np.clip(cq[..., 0], -(1 << 15), (1 << 15) - 1).astype(np.int16)
    ac = np.clip(cq, -127, 127).astype(np.int8)
    ac[..., 0] = 0
    return dc, ac


def encode_dct420(image, quality: int = 90, pad_to: tuple[int, int] | None = None) -> DctImage:
    """uint8 RGB [H,W,3] (or (Y, UV) planes) -> :class:`DctImage`.

    ``pad_to`` zero-pads (black luma / neutral chroma) to a bucketed canvas
    BEFORE the transform so padded blocks carry near-zero coefficients —
    the coefficient-space equivalent of the YUV path's padded canvas."""
    from facedet_tpu.ops.color import rgb_to_yuv420

    if isinstance(image, tuple):
        y, uv = image
    else:
        y, uv = rgb_to_yuv420(np.asarray(image))
    h, w = y.shape
    if pad_to is not None:
        ph, pw = pad_to
    else:
        ph, pw = -(-h // 16) * 16, -(-w // 16) * 16
    if ph % 16 or pw % 16:
        raise ValueError(f"dct420 canvas must be a multiple of 16, got {(ph, pw)}")
    y_p = np.zeros((ph, pw), np.float32)
    y_p[:h, :w] = y
    uv_p = np.full((ph // 2, pw // 2, 2), 128.0, np.float32)
    uv_p[: uv.shape[0], : uv.shape[1]] = uv

    qy, qc = quality_tables(quality)
    y_dc, y_ac = _quantize_plane(y_p - 128.0, qy)
    u_dc, u_ac = _quantize_plane(uv_p[..., 0] - 128.0, qc)
    v_dc, v_ac = _quantize_plane(uv_p[..., 1] - 128.0, qc)
    return DctImage(
        y_dc=y_dc,
        y_ac=y_ac,
        uv_dc=np.stack([u_dc, v_dc], axis=2),
        uv_ac=np.stack([u_ac, v_ac], axis=2),
        qy=qy,
        qc=qc,
        hw=(h, w),
    )


def _idct_plane(dc, ac, q, out_dtype=jnp.float32):
    """Device: (dc [Hb,Wb] int, ac [Hb,Wb,64] int, q [64]) -> [H, W] float
    (level-shifted back, clipped to [0, 255]). One [N,64]@[64,64] matmul on
    the MXU, dequantisation folded into the basis rows.

    The matmul always runs in float32; ``out_dtype`` only controls the stored
    plane. bfloat16 halves the bytes moved by the block->row relayout (the
    transpose, not the matmul, dominates this op's device time) and is
    harmless fidelity-wise: pixel values live in [0, 255] where bf16 spacing
    is <= 1.0 — the same +-0.5 rounding every JPEG decoder applies when it
    stores uint8."""
    coef = ac.astype(jnp.float32)
    coef = coef.at[..., 0].set(dc.astype(jnp.float32))
    hb, wb = coef.shape[0], coef.shape[1]
    basis = q[:, None] * jnp.asarray(_IDCT64)
    blocks = coef.reshape(hb * wb, 64) @ basis + 128.0
    blocks = jnp.clip(blocks, 0.0, 255.0).astype(out_dtype)
    return blocks.reshape(hb, wb, 8, 8).transpose(0, 2, 1, 3).reshape(hb * 8, wb * 8)


def decode_dct420_to_yuv_f32(y_dc, y_ac, uv_dc, uv_ac, qy, qc,
                             out_dtype=jnp.float32):
    """Device-side: quantized planes -> (Y [H,W], UV [H/2,W/2,2]) in
    ``out_dtype`` (float32 default; bfloat16 for the serving canvas), the
    float inputs of ops/color.py's YUV->RGB stage. Jit/vmap-friendly."""
    y = _idct_plane(y_dc, y_ac, qy, out_dtype)
    u = _idct_plane(uv_dc[..., 0], uv_ac[..., 0, :], qc, out_dtype)
    v = _idct_plane(uv_dc[..., 1], uv_ac[..., 1, :], qc, out_dtype)
    return y, jnp.stack([u, v], axis=-1)


def decode_dct420_np(img: DctImage) -> tuple[np.ndarray, np.ndarray]:
    """Host-side numpy decode (visualization/tests): -> (Y uint8 [Hp,Wp],
    UV uint8 [Hp/2,Wp/2,2]) at the padded canvas size."""
    def plane(dc, ac, q):
        coef = ac.astype(np.float32)
        coef[..., 0] = dc.astype(np.float32)
        coef = (coef * q).reshape(*coef.shape[:2], 8, 8)
        blocks = np.einsum("ji,byjk,kl->byil", _C, coef, _C)
        hb, wb = blocks.shape[:2]
        out = blocks.transpose(0, 2, 1, 3).reshape(hb * 8, wb * 8) + 128.0
        return np.clip(np.rint(out), 0, 255).astype(np.uint8)

    y = plane(img.y_dc, img.y_ac.copy(), img.qy)
    u = plane(img.uv_dc[..., 0], img.uv_ac[..., 0, :].copy(), img.qc)
    v = plane(img.uv_dc[..., 1], img.uv_ac[..., 1, :].copy(), img.qc)
    return y, np.stack([u, v], axis=-1)


def encode_dct420_device(rgb, qy, qc, wide_ac: bool = False):
    """Device-side forward transform — the mirror of
    :func:`decode_dct420_to_yuv_f32`, for FETCHING large images (e.g. x4
    Real-ESRGAN outputs, 16x the input pixels) as quantized coefficients
    instead of raw RGB: ~2x fewer nominal bytes and wire-layout zero runs the
    link compressor crushes (BENCH.md round-3 ingest + wire-layout studies).

    ``rgb`` float32 [H, W, 3] in [0, 1], H and W multiples of 16; ``qy``/
    ``qc`` float32 [64] quant tables. Returns wire-layout planes
    (y_dc int16 [Hb, Wb], y_ac int8 [64, Hb, Wb], uv_dc int16 [Hb2, Wb2, 2],
    uv_ac int8 [2, 64, Hb2, Wb2]) plus ``n_clipped`` (int32 scalar: how many
    AC coefficients exceeded the int8 wire range and were clipped) — RGB->
    YCbCr matmul, 2x2 chroma mean, and per-block 8x8 FDCT matmuls all run on
    the MXU inside the caller's jit. Same lossy-ness as a quality-``q`` JPEG
    save when ``n_clipped == 0``; a nonzero count means extreme-contrast
    blocks were truncated, mirroring the read path's -6 refusal — callers
    should fall back to a pixel fetch (engine/enhancer.py::enhance_to_jpeg
    does). The host entropy-codes the planes into a real .jpg with no
    further transform (native jpeg_write_coefficients).

    ``wide_ac=True`` emits int16 AC planes clipped at JPEG baseline
    Huffman's 1023 magnitude ceiling instead: sharpened SR outputs (the GAN
    arm especially) routinely overflow int8 in a few hundred blocks, which
    forced EVERY serving image through the 2x-cost pixel-fetch fallback
    (measured: probe_sr_e2e, BENCH.md round-5 SR serving study). The wide
    wire doubles nominal AC bytes but they stay ~87% zeros, and the sparse
    pack ships values-only at the true density."""
    from facedet_tpu.ops.color import _FWD

    x = rgb * 255.0
    ycc = x @ jnp.asarray(_FWD).T
    y = ycc[..., 0]
    h, w = y.shape
    cb = ycc[..., 1].reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3)) + 128.0
    cr = ycc[..., 2].reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3)) + 128.0

    c = jnp.asarray(_C)

    ac_limit, ac_dtype = (1023.0, jnp.int16) if wide_ac else (127.0, jnp.int8)

    def plane(p, q):
        hb, wb = p.shape[0] // 8, p.shape[1] // 8
        blocks = p.reshape(hb, 8, wb, 8).transpose(0, 2, 1, 3) - 128.0
        coef = jnp.einsum("ij,xyjk,lk->xyil", c, blocks, c)
        cq = jnp.round(coef.reshape(hb, wb, 64) / q)
        dc = jnp.clip(cq[..., 0], -(1 << 15), (1 << 15) - 1).astype(jnp.int16)
        clipped = jnp.sum(
            (jnp.abs(cq.at[..., 0].set(0.0)) > ac_limit).astype(jnp.int32)
        )
        ac = jnp.clip(cq, -ac_limit, ac_limit).astype(ac_dtype)
        ac = ac.at[..., 0].set(0)
        return dc, jnp.moveaxis(ac, -1, 0), clipped  # wire layout

    y_dc, y_ac, y_cl = plane(y, qy)
    u_dc, u_ac, u_cl = plane(cb, qc)
    v_dc, v_ac, v_cl = plane(cr, qc)
    return (
        y_dc,
        y_ac,
        jnp.stack([u_dc, v_dc], axis=2),
        jnp.stack([u_ac, v_ac], axis=0),
        y_cl + u_cl + v_cl,
    )


def wire_planes_to_dct_image(planes, qy, qc, hw) -> DctImage:
    """Host-side: wire-layout fetched planes -> :class:`DctImage` (block-major
    numpy), for decode_dct420_np or the native JPEG writer."""
    y_dc, y_ac, uv_dc, uv_ac = (np.asarray(p) for p in planes)
    return DctImage(
        y_dc=y_dc,
        y_ac=np.moveaxis(y_ac, 0, -1),
        uv_dc=uv_dc,
        uv_ac=np.moveaxis(uv_ac, (0, 1), (2, 3)),
        qy=np.asarray(qy, np.float32),
        qc=np.asarray(qc, np.float32),
        hw=tuple(hw),
    )


def dct420_bytes(h: int, w: int) -> int:
    """H2D bytes for one dct420 image at (16-bucketed) h x w."""
    yb = (h // 8) * (w // 8)
    cb = (h // 16) * (w // 16) * 2
    return yb * 64 + yb * 2 + cb * 64 + cb * 2  # ac int8 + dc int16


# --- sparse AC wire encoding ("dct420s" ingest) -----------------------------
#
# The dense AC planes are ~85-97% zeros; the link compressor recovers only
# ~1.9x of that redundancy. Shipping an explicit sparse pair instead cuts
# NOMINAL bytes ~3-6x and measured upload time ~3.4x on the real tunnel
# (BENCH.md round-3 sparse-wire A/B). Wire format: uint16 POSITION DELTAS
# between consecutive nonzeros + the int8 values, both padded to a bucketed
# capacity. Deltas (JPEG's own run-length idea) were chosen over a presence
# bitmap after device profiling: reconstructing from a bitmap needs an
# n-sized rank gather that XLA scalarizes (~1.9 s per 64-image batch on the
# v5e); delta decode is a cap-sized cumsum + scatter (~0.06 s measured) and
# the nominal bytes are smaller at photo-typical densities too. Delta
# overflow (a >65534 zero run) inserts dummy entries with value 0 — they
# scatter a zero onto a zero coefficient, a no-op by construction.


def sparse_cap_bucket(nnz: int, total: int) -> int:
    """Geometric capacity bucket (x1.25 steps) for the packed-values array:
    bounds jit recompiles across batches while capping padding waste."""
    cap = max(4096, total // 64)
    while cap < nnz:
        cap = min((int(cap * 1.25) + 7) & ~7, total)
    return min(cap, total)


_DELTA_MAX = 65534  # max encodable gap; larger runs insert value-0 dummies


def sparse_nnz_entries(flat: np.ndarray, nz: np.ndarray | None = None) -> int:
    """Number of wire entries pack_sparse_ac needs for ``flat`` (true
    nonzeros + overflow dummies + the parking jump) — for capacity sizing.
    Pass a precomputed ``nz = np.flatnonzero(flat)`` to share the scan with
    the subsequent pack (the scan dominates the host cost)."""
    if nz is None:
        nz = np.flatnonzero(flat)
    if nz.size == 0:
        return 1
    gaps = np.diff(nz, prepend=-1)
    return int(nz.size + ((gaps - 1) // _DELTA_MAX).sum()) + 1


def pack_sparse_ac(
    flat: np.ndarray, cap: int, nz: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Host: flat int8 AC coefficients [n] -> (position deltas uint16 [cap],
    values int8 [cap]).

    Entry k advances the write position by deltas[k] (position starts at -1)
    and writes vals[k] there. Gaps above _DELTA_MAX emit dummy entries with
    value 0 — their zero lands on a zero coefficient, a no-op. After the
    last real entry one extra delta parks the position past the nonzeros so
    the zero padding tail (delta 0) rewrites a zero coefficient instead of
    the last real value; the device decode drops writes at/after slot n."""
    n = flat.size
    if nz is None:
        nz = np.flatnonzero(flat)
    gaps = np.diff(nz, prepend=-1)
    n_dummy = (gaps - 1) // _DELTA_MAX  # per real entry, preceding dummies
    total = int(nz.size + n_dummy.sum()) + 1
    if total > cap:
        raise ValueError(f"sparse AC capacity {cap} < entries {total}")
    deltas = np.zeros(cap, np.uint16)
    vals = np.zeros(cap, np.int8)
    real_pos = np.cumsum(n_dummy + 1) - 1  # wire slot of each real entry
    # dummy slots advance by the max gap; real slots carry the remainder
    deltas[: total - 1] = _DELTA_MAX
    deltas[real_pos] = gaps - n_dummy * _DELTA_MAX
    vals[real_pos] = flat[nz]
    # park the tail past the last nonzero (onto zero coefficients / the
    # dump slot) so padding entries (delta 0, val 0) stay no-ops
    prev = int(nz[-1]) if nz.size else -1
    deltas[total - 1] = min(n - prev, _DELTA_MAX)
    return deltas, vals


def unpack_sparse_ac(deltas, vals, n: int):
    """Device inverse of :func:`pack_sparse_ac`: (deltas uint16 [cap],
    vals int8 [cap]) -> flat int8 [n].

    A cap-sized cumsum + scatter. This formulation exists because the
    bitmap alternative needs an n-sized rank GATHER that XLA scalarizes on
    TPU — measured 1.91 s vs 0.06 s for this scatter on a 64-image batch
    (BENCH.md round-3 sparse-wire follow-up). Writes at/after slot n (the
    parking tail and zero padding) land in a dump slot and are dropped."""
    pos = jnp.cumsum(deltas.astype(jnp.int32)) - 1
    pos = jnp.minimum(pos, n)  # n = dump slot
    # positions are strictly increasing over the real region (pack emits
    # delta >= 1 per entry; only the parking tail collides, at the dump slot
    # that [:n] slices away) — the sorted/unique hints let XLA lower this as
    # a vectorized merge instead of a per-element scatter loop
    return (
        jnp.zeros(n + 1, jnp.int8)
        .at[pos]
        .set(vals, mode="drop", indices_are_sorted=True, unique_indices=True)[:n]
    )


def unpack_sparse_ac_np(deltas, vals, n: int) -> np.ndarray:
    """Host inverse of :func:`pack_sparse_ac` (tests/debug)."""
    pos = np.cumsum(np.asarray(deltas, np.int64)) - 1
    flat = np.zeros(n + 1, np.int8)
    keep = pos <= n
    flat[np.minimum(pos[keep], n)] = np.asarray(vals)[keep]
    return flat[:n]


# --- single-buffer batch wire (serving hot path) -----------------------------
#
# The staged dct420s batch is six arrays; uploading them as six device_puts
# pays tunnel setup/RTT per transfer (measured 0.46 s vs 0.32 s for one
# contiguous buffer on a 64-image batch). The wire concatenates their raw
# bytes host-side; the device inverse is static slices + bitcasts that fuse
# into the input stage of the pipeline (bitcast little-endianness verified
# exact on the axon TPU for int16/uint16/float32/int8).


def _wire_sections(n: int, bucket_h: int, bucket_w: int) -> list[int]:
    yb_h, yb_w = bucket_h // 8, bucket_w // 8
    cb_h, cb_w = bucket_h // 16, bucket_w // 16
    return [
        n * yb_h * yb_w * 2,      # y_dc int16
        n * cb_h * cb_w * 2 * 2,  # uv_dc int16 [n,cb_h,cb_w,2]
        n * 64 * 4,               # qy float32
        n * 64 * 4,               # qc float32
    ]


def wire_pack_dct420s(y_dc, uv_dc, qy, qc, deltas, vals) -> np.ndarray:
    """Staged dct420s batch arrays -> ONE contiguous uint8 upload buffer."""
    return np.concatenate(
        [
            np.ascontiguousarray(a).view(np.uint8).ravel()
            for a in (y_dc, uv_dc, qy, qc, deltas, vals)
        ]
    )


def wire_unpack_dct420s(wire, n: int, bucket_h: int, bucket_w: int):
    """Device inverse of :func:`wire_pack_dct420s` (jnp bitcasts; shapes are
    static at trace time — cap derives from the wire length)."""
    import jax

    yb_h, yb_w = bucket_h // 8, bucket_w // 8
    cb_h, cb_w = bucket_h // 16, bucket_w // 16
    sizes = _wire_sections(n, bucket_h, bucket_w)
    fixed = sum(sizes)
    cap = (wire.shape[0] - fixed) // (3 * n)  # deltas uint16 + vals int8
    o = np.cumsum([0] + sizes)
    bc = jax.lax.bitcast_convert_type
    y_dc = bc(wire[o[0] : o[1]].reshape(n, yb_h, yb_w, 2), jnp.int16)
    uv_dc = bc(wire[o[1] : o[2]].reshape(n, cb_h, cb_w, 2, 2), jnp.int16)
    qy = bc(wire[o[2] : o[3]].reshape(n, 64, 4), jnp.float32)
    qc = bc(wire[o[3] : o[4]].reshape(n, 64, 4), jnp.float32)
    deltas = bc(wire[fixed : fixed + 2 * n * cap].reshape(n, cap, 2), jnp.uint16)
    vals = bc(wire[fixed + 2 * n * cap :].reshape(n, cap), jnp.int8)
    return y_dc, uv_dc, qy, qc, deltas, vals


def wire_unpack_dct420s_np(wire: np.ndarray, n: int, bucket_h: int, bucket_w: int):
    """Host inverse (numpy views, zero-copy) — tests and stage profiling."""
    yb_h, yb_w = bucket_h // 8, bucket_w // 8
    cb_h, cb_w = bucket_h // 16, bucket_w // 16
    sizes = _wire_sections(n, bucket_h, bucket_w)
    fixed = sum(sizes)
    cap = (wire.shape[0] - fixed) // (3 * n)
    o = np.cumsum([0] + sizes)
    y_dc = wire[o[0] : o[1]].view(np.int16).reshape(n, yb_h, yb_w)
    uv_dc = wire[o[1] : o[2]].view(np.int16).reshape(n, cb_h, cb_w, 2)
    qy = wire[o[2] : o[3]].view(np.float32).reshape(n, 64)
    qc = wire[o[3] : o[4]].view(np.float32).reshape(n, 64)
    deltas = wire[fixed : fixed + 2 * n * cap].view(np.uint16).reshape(n, cap)
    vals = wire[fixed + 2 * n * cap :].view(np.int8).reshape(n, cap)
    return y_dc, uv_dc, qy, qc, deltas, vals


# --- native batch packer (serving hot path) ---------------------------------
#
# At batch 64 the numpy pack costs ~0.75 s (two index-materializing
# flatnonzero passes over ~150 MB of int8) — the critical path of the
# stream's staging worker. native/sparse_pack.cpp replays the identical
# semantics as a single word-skipping scan with a thread per image slice.

_PACK_LIB = None
_PACK_FAILED = False


def _load_pack_native():
    global _PACK_LIB, _PACK_FAILED
    if _PACK_LIB is not None or _PACK_FAILED:
        return _PACK_LIB
    import ctypes
    import os
    import subprocess
    import threading

    lock = getattr(_load_pack_native, "_lock", None)
    if lock is None:
        lock = _load_pack_native._lock = threading.Lock()
    with lock:
        if _PACK_LIB is not None or _PACK_FAILED:
            return _PACK_LIB
        native_dir = os.path.join(
            os.path.dirname(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            ),
            "native",
        )
        src = os.path.join(native_dir, "sparse_pack.cpp")
        so = os.path.join(native_dir, "libsparse_pack.so")
        try:
            if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-pthread", src, "-o", so],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(so)
            lib.sparse_count_entries_batch.argtypes = [
                ctypes.POINTER(ctypes.c_byte),
                ctypes.c_long,
                ctypes.c_long,
                ctypes.POINTER(ctypes.c_long),
            ]
            lib.sparse_count_entries_batch.restype = None
            lib.pack_sparse_ac_batch.argtypes = [
                ctypes.POINTER(ctypes.c_byte),
                ctypes.c_long,
                ctypes.c_long,
                ctypes.c_long,
                ctypes.POINTER(ctypes.c_ushort),
                ctypes.POINTER(ctypes.c_byte),
            ]
            lib.pack_sparse_ac_batch.restype = ctypes.c_int
            _PACK_LIB = lib
        except Exception:
            _PACK_FAILED = True
            _PACK_LIB = None
    return _PACK_LIB


def pack_sparse_ac_batch(
    flat2d: np.ndarray, alloc=None
) -> tuple[np.ndarray, np.ndarray]:
    """Batch :func:`pack_sparse_ac` over ``flat2d [n_imgs, total]`` int8 with
    one shared capacity bucket (max entries across the batch). Native C++
    when available, numpy fallback with identical output.

    ``alloc(cap) -> (deltas [n,cap] uint16, vals [n,cap] int8)`` lets the
    caller provide the output arrays once the capacity is known — the wire
    staging path passes views into its single upload buffer so the pack
    writes directly to the wire (no concat copy). Both arrays are fully
    overwritten (tails zero-padded by the packer)."""
    import ctypes

    flat2d = np.ascontiguousarray(flat2d, np.int8)
    n, total = flat2d.shape
    lib = _load_pack_native()
    if lib is None:
        nzs = [np.flatnonzero(flat2d[i]) for i in range(n)]
        cap = sparse_cap_bucket(
            max(sparse_nnz_entries(flat2d[i], nz=nzs[i]) for i in range(n)),
            total,
        )
        deltas, vals = alloc(cap) if alloc else (
            np.zeros((n, cap), np.uint16),
            np.zeros((n, cap), np.int8),
        )
        for i in range(n):
            deltas[i], vals[i] = pack_sparse_ac(flat2d[i], cap, nz=nzs[i])
        return deltas, vals
    entries = np.empty(n, np.int64)
    flat_ptr = flat2d.ctypes.data_as(ctypes.POINTER(ctypes.c_byte))
    lib.sparse_count_entries_batch(
        flat_ptr, n, total, entries.ctypes.data_as(ctypes.POINTER(ctypes.c_long))
    )
    cap = sparse_cap_bucket(int(entries.max()), total)
    deltas, vals = alloc(cap) if alloc else (
        np.empty((n, cap), np.uint16),
        np.empty((n, cap), np.int8),
    )
    ret = lib.pack_sparse_ac_batch(
        flat_ptr,
        n,
        total,
        cap,
        deltas.ctypes.data_as(ctypes.POINTER(ctypes.c_ushort)),
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_byte)),
    )
    if ret != 0:  # cannot happen with a cap sized from the count pass
        raise RuntimeError("native sparse pack overflowed its capacity bucket")
    return deltas, vals


# --- sparse-bitmap FETCH wire (SR coefficient download) ---------------------
#
# The fetch direction packs on DEVICE, where the cheap ops are the inverse
# of the ingest's: a bit-pack + rank scatter runs inside the SR dispatch at
# HBM speed, while producing position deltas would need the expensive
# select; the HOST side then pays the (cheap for it) bitmap rank expansion.


def pack_sparse_bitmap_device(flat, cap: int):
    """Device pack for the FETCH direction (sparse download of
    device-encoded SR coefficients): flat int [n] (n % 8 == 0) ->
    (bitmap uint8 [n/8] big-endian bits, vals [cap] of flat's dtype,
    nnz int32). ``cap`` is static; when nnz > cap the overflow values are
    dropped into a dump slot — callers MUST check the returned nnz and fall
    back to a dense fetch rather than use truncated values."""
    mask = flat != 0
    ranks = jnp.cumsum(mask.astype(jnp.int32)) - 1
    nnz = jnp.where(mask.shape[0] > 0, ranks[-1] + 1, 0)
    pos = jnp.where(mask & (ranks < cap), ranks, cap)  # cap = dump slot
    vals = jnp.zeros(cap + 1, flat.dtype).at[pos].set(flat, mode="drop")[:cap]
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.int32)
    bitmap = (mask.reshape(-1, 8).astype(jnp.int32) * weights).sum(axis=1)
    return bitmap.astype(jnp.uint8), vals, nnz


def unpack_sparse_bitmap_np(bitmap, vals, n: int) -> np.ndarray:
    """Host inverse of the sparse-bitmap fetch wire -> flat [n] of vals'
    dtype (int8 compact wire or int16 wide wire)."""
    vals = np.asarray(vals)
    bits = np.unpackbits(np.asarray(bitmap, np.uint8))[:n].astype(bool)
    flat = np.zeros(n, vals.dtype)
    flat[bits] = vals[: int(bits.sum())]
    return flat
