"""Planar YUV 4:2:0 color ops — the low-bandwidth image ingest path.

The serving pipeline is host-link bound: the dominant per-image cost over a
remote-attached TPU is uploading the uint8 RGB canvas (3 bytes/pixel). JPEG
sources are already stored as 4:2:0-subsampled YCbCr, so uploading planar
YUV420 (1.5 bytes/pixel) and doing the chroma upsample + color conversion on
device halves H2D bytes with no information loss relative to the decoded JPEG.

Conventions: JFIF full-range BT.601 — the same matrix libjpeg applies when it
converts to RGB (the reference decodes JPEGs through OpenCV/PIL which use the
identical convention). Chroma is the 2x2 box mean on the encode side and
bilinear (aligned, half-pixel-centered) on the decode side, matching typical
JPEG chroma upsampling closely enough that detections are unchanged (see
tests/test_color.py for the pipeline-level parity bound).

Reference context: the reference's per-slice CUDA path never faces this
problem (PCIe-local GPU); over a tunneled TPU the upload *is* the bottleneck
(BENCH.md "Compute vs transfer accounting").
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "rgb_to_yuv420",
    "yuv420_to_rgb_np",
    "yuv420_to_rgb_f32",
    "yuv420_bytes",
]

# JFIF full-range BT.601 (libjpeg jccolor.c constants).
_FWD = np.array(
    [
        [0.299, 0.587, 0.114],          # Y
        [-0.168735892, -0.331264108, 0.5],  # Cb (+128)
        [0.5, -0.418687589, -0.081312411],  # Cr (+128)
    ],
    np.float32,
)
_INV = np.array(
    [
        [1.0, 0.0, 1.402],              # R from (Y, Cb-128, Cr-128)
        [1.0, -0.344136286, -0.714136286],  # G
        [1.0, 1.772, 0.0],              # B
    ],
    np.float32,
)


def rgb_to_yuv420(img: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """uint8 RGB [H,W,3] -> (Y uint8 [H,W], UV uint8 [ceil(H/2),ceil(W/2),2]).

    Odd dimensions are edge-replicated to even before the 2x2 chroma mean (the
    JPEG convention). Host-side numpy; cheap relative to the upload it halves.
    """
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = np.clip(img, 0, 255).astype(np.uint8)
    h, w = img.shape[:2]
    f = img.astype(np.float32)
    y = f @ _FWD[0]
    cb = f @ _FWD[1] + 128.0
    cr = f @ _FWD[2] + 128.0
    if h % 2 or w % 2:
        pad_h, pad_w = h % 2, w % 2
        cb = np.pad(cb, ((0, pad_h), (0, pad_w)), mode="edge")
        cr = np.pad(cr, ((0, pad_h), (0, pad_w)), mode="edge")
    hh, ww = cb.shape[0] // 2, cb.shape[1] // 2
    cb = cb.reshape(hh, 2, ww, 2).mean(axis=(1, 3))
    cr = cr.reshape(hh, 2, ww, 2).mean(axis=(1, 3))
    y8 = np.clip(np.rint(y), 0, 255).astype(np.uint8)
    uv8 = np.clip(np.rint(np.stack([cb, cr], axis=-1)), 0, 255).astype(np.uint8)
    return y8, uv8


def _up2x_axis(x: jax.Array, axis: int) -> jax.Array:
    """Exact 2x linear upsample along one axis (half-pixel centres, edge
    clamp — the jax.image.resize 'linear' convention): out[2i] = .25*x[i-1]
    + .75*x[i], out[2i+1] = .75*x[i] + .25*x[i+1], written as shifted adds so
    XLA fuses it instead of the dense [n, n/2] resize matmul."""
    x = jnp.moveaxis(x, axis, 0)
    xm = jnp.concatenate([x[:1], x[:-1]], axis=0)
    xp = jnp.concatenate([x[1:], x[-1:]], axis=0)
    even = 0.75 * x + 0.25 * xm
    odd = 0.75 * x + 0.25 * xp
    out = jnp.stack([even, odd], axis=1).reshape((2 * x.shape[0],) + x.shape[1:])
    return jnp.moveaxis(out, 0, axis)


def _upsample_chroma(uv: jax.Array, h: int, w: int) -> jax.Array:
    """[h/2, w/2, 2] float chroma -> [h, w, 2] via bilinear 2x upsample."""
    if h == 2 * uv.shape[0] and w == 2 * uv.shape[1]:
        return _up2x_axis(_up2x_axis(uv, 0), 1)
    return jax.image.resize(uv, (h, w, uv.shape[-1]), method="linear")


def yuv420_to_rgb_f32(y: jax.Array, uv: jax.Array, out_dtype=jnp.float32) -> jax.Array:
    """Device-side: (Y [H,W] uint8/float, UV [H/2,W/2,2] uint8/float) -> RGB
    [H,W,3] in [0,1] — the fused pipeline's normalized-input format, so the
    conversion fuses into the first detector conv's input pipeline under XLA.

    ``out_dtype=bfloat16`` computes the upsample/convert in bfloat16 (halving
    the HBM traffic of the canvas stages for bf16 serving); on [0, 255]-scale
    inputs that costs <= +-0.5 pixel — the rounding a uint8 decode applies
    anyway. float32 (default) keeps exact f32 math for fidelity paths."""
    h, w = y.shape[0], y.shape[1]
    dt = jnp.dtype(out_dtype)
    yf = y.astype(dt)
    uvf = _upsample_chroma(uv.astype(dt), h, w) - jnp.asarray(128.0, dt)
    ycc = jnp.stack([yf, uvf[..., 0], uvf[..., 1]], axis=-1)
    rgb = ycc @ jnp.asarray(_INV).T.astype(dt)
    return jnp.clip(rgb / 255.0, 0.0, 1.0).astype(dt)


def yuv420_to_rgb_np(y: np.ndarray, uv: np.ndarray) -> np.ndarray:
    """Host-side reconstruction (for visualization of YUV-ingested frames)."""
    h, w = y.shape[:2]
    uvf = uv.astype(np.float32)
    # nearest-doubling then crop keeps this dependency-free; visualization only
    up = np.repeat(np.repeat(uvf, 2, axis=0), 2, axis=1)[:h, :w] - 128.0
    ycc = np.stack([y.astype(np.float32), up[..., 0], up[..., 1]], axis=-1)
    rgb = ycc @ _INV.T
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def yuv420_bytes(h: int, w: int) -> int:
    """H2D bytes for one YUV420 image at (even-bucketed) h x w."""
    return h * w + 2 * ((h + 1) // 2) * ((w + 1) // 2)
