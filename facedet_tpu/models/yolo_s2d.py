"""Exact space-to-depth rewrite of the early YOLOv11 backbone for TPU.

Why: the per-layer device bisect (tools/profile_layers.py) showed the first
three layers — stem (3ch), down1 (32ch), c3k2_0 (64ch at 160x160) — cost
0.53 of the 0.85 ms/tile forward while running at 1-8 TFLOP/s, because the
TPU vector lanes and MXU tiles pad the channel axis to 128: a 3-channel conv
wastes 125/128 of the machine.  Rewriting those layers in space-to-depth form
(spatial 2x2/4x4 phases folded into channels) runs the same math on
48-512-channel tensors at 30-100 TF/s (tools_probe_s2d.py measurements).

The rewrite is EXACT, not an approximation: every transformed kernel is a
zero-padded permutation of the standard checkpoint kernel, built in-jit from
the untouched variables tree.  Checkpoints, training, init and the ONNX
export all keep the standard layout; only the inference ``tile_forward``
dispatch uses this path (engine/detector.py).

Phase ordering is channel-major — s2d channel index = c*R^2 + p*R + q with c
the natural channel and (p, q) the row/col phase.  This makes channel concat,
channel split and residual adds in s2d space byte-for-byte mirrors of the
natural ops, which is what lets the whole C3k2 block run without leaving s2d
space.

Derivation of the kernel masks (natural conv pad 1, kernel 3):
  * stem' (natural 3x3 stride-2 on the full image, input held as s2d4 blocks,
    output emitted as s2d2-of-half-res): natural input row m = 4I + 2p' + a - 1
    for output block I, output phase p', tap a; as a 2x2 block conv with block
    pad (1, 0) the input block is I-1+u, so a = 4u + p4 - 2p' - 3.
  * down1' (natural 3x3 stride-2 on the half-res grid, input s2d2, output
    s2d2-of-quarter-res): 3x3 stride-2 block conv, a = 2w + p - 2p' - 1.
  * 3x3 stride-1 inside s2d2 space: 3x3 stride-1 block conv, a = 2u + p - p' - 1.
  * 1x1 convs: block-diagonal kron(K, I4) — each phase sees the natural kernel.
Invalid taps (a outside [0, 3)) are exact zeros, which also reproduces the
natural zero padding at the image border.

Reference behaviour being accelerated: the per-slice ultralytics forward of
/root/reference/utils/yolo_wrapper.py:74-80 (here one fused dispatch over the
whole tile batch).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from facedet_tpu.models.yolov11 import YoloConfig

_DN = ("NHWC", "HWIO", "NHWC")


def _phase_mask(block_taps: int, in_phases: int, tap_of) -> np.ndarray:
    """M[u, p, e, a] = 1 iff natural tap ``a = tap_of(u, p, e)`` is in [0, 3)."""
    m = np.zeros((block_taps, in_phases, 2, 3), np.float32)
    for u in range(block_taps):
        for p in range(in_phases):
            for e in range(2):
                a = tap_of(u, p, e)
                if 0 <= a < 3:
                    m[u, p, e, a] = 1.0
    return m


_M_STEM = _phase_mask(2, 4, lambda u, p, e: 4 * u + p - 2 * e - 3)
_M_DOWN = _phase_mask(3, 2, lambda u, p, e: 2 * u + p - 2 * e - 1)
_M_S1 = _phase_mask(3, 2, lambda u, p, e: 2 * u + p - e - 1)


def _transform_kernel(k: jax.Array, mask: np.ndarray, in_phases: int) -> jax.Array:
    """(3,3,C,D) natural kernel -> (T,T, C*ph^2, D*4) block kernel (channel-major)."""
    m = jnp.asarray(mask, jnp.float32)
    k2 = jnp.einsum("abcd,xpea,yqfb->xycpqdef", k.astype(jnp.float32), m, m)
    t = mask.shape[0]
    c, d = k.shape[2], k.shape[3]
    return k2.reshape(t, t, c * in_phases * in_phases, d * 4)


def _pw_kernel(k: jax.Array) -> jax.Array:
    """(1,1,C,D) natural 1x1 kernel -> (1,1,4C,4D) block-diagonal s2d kernel."""
    c, d = k.shape[2], k.shape[3]
    eye = jnp.eye(4, dtype=jnp.float32)
    k2 = jnp.einsum("cd,ij->cidj", k[0, 0].astype(jnp.float32), eye)
    return k2.reshape(1, 1, c * 4, d * 4)


def space_to_depth(x: jax.Array, r: int) -> jax.Array:
    """NHWC s2d with channel-major phase order: ch = c*r^2 + p*r + q."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # b, h', w', c, p, q
    return x.reshape(b, h // r, w // r, c * r * r)


def depth_to_space(x: jax.Array, r: int) -> jax.Array:
    b, h, w, cc = x.shape
    c = cc // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, p, w, q, c
    return x.reshape(b, h * r, w * r, c)


def _conv(x: jax.Array, k: jax.Array, stride: int, pad) -> jax.Array:
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, _DN)
    return jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (stride, stride), pad, dimension_numbers=dn
    )


def _bn_silu(x: jax.Array, bn_p, bn_s, repeat: int, bdt=jnp.float32, act: bool = True) -> jax.Array:
    """Folded inference BatchNorm (+SiLU), phase-repeated.

    Mirrors layers.ConvBnAct: the affine+SiLU run in ``bdt`` (the config's
    bn_dtype — float32 matches training numerics, bfloat16 keeps activations
    at 2 bytes) and the activation dtype is ``bdt``.
    """
    g = bn_p["scale"] / jnp.sqrt(bn_s["var"] + 1e-3)
    b = bn_p["bias"] - bn_s["mean"] * g
    g = jnp.repeat(g, repeat).astype(bdt)
    b = jnp.repeat(b, repeat).astype(bdt)
    y = x.astype(bdt) * g + b
    return jax.nn.silu(y) if act else y


def _cba_s2d(x, params, stats, kernel_kind: str, dt, bdt) -> jax.Array:
    """ConvBnAct in s2d2 space. kernel_kind: 'pw' (1x1) or 's1' (3x3 stride 1)."""
    k = params["conv"]["kernel"]
    if kernel_kind == "pw":
        k2 = _pw_kernel(k)
        y = _conv(x.astype(dt), k2, 1, ((0, 0), (0, 0)))
    else:
        k2 = _transform_kernel(k, _M_S1, 2)
        y = _conv(x.astype(dt), k2, 1, ((1, 1), (1, 1)))
    return _bn_silu(y, params["bn"], stats["bn"], 4, bdt)


def _bottleneck_s2d(x, params, stats, dt, bdt) -> jax.Array:
    """Bottleneck(expansion=0.5, 3x3+3x3, residual) in s2d2 space."""
    y = _cba_s2d(x, params["cv1"], stats["cv1"], "s1", dt, bdt)
    y = _cba_s2d(y, params["cv2"], stats["cv2"], "s1", dt, bdt)
    return x.astype(y.dtype) + y


def s2d_early_forward(variables, x: jax.Array, cfg: YoloConfig) -> jax.Array:
    """Exact replacement for backbone stem+down1+c3k2_0 (models/yolov11.py:78-82).

    x: [B, H, W, 3] in [0, 1], H and W divisible by 4.
    Returns the natural-space c3k2_0 output [B, H/4, W/4, ch(256)] (float32,
    post-BN+SiLU) ready for the ``down2`` layer.
    """
    dt = cfg.compute_dtype
    bdt = cfg.bn_compute_dtype
    bp = variables["params"]["backbone"]
    bs = variables["batch_stats"]["backbone"]

    x = space_to_depth(x.astype(dt), 4)  # [B, H/4, W/4, 48]

    # stem: natural 3x3 s2 3->ch(64); here 2x2 block conv, block pad (1, 0)
    k = _transform_kernel(bp["stem"]["conv"]["kernel"], _M_STEM, 4)
    y = _conv(x, k, 1, ((1, 0), (1, 0)))
    y = _bn_silu(y, bp["stem"]["bn"], bs["stem"]["bn"], 4, bdt)

    # down1: natural 3x3 s2 ch(64)->ch(128); here 3x3 s2 block conv
    k = _transform_kernel(bp["down1"]["conv"]["kernel"], _M_DOWN, 2)
    y = _conv(y.astype(dt), k, 2, ((1, 1), (1, 1)))
    y = _bn_silu(y, bp["down1"]["bn"], bs["down1"]["bn"], 4, bdt)

    # c3k2_0 (c3k=False, expansion 0.25) entirely in s2d2 space
    cp, cs = bp["c3k2_0"], bs["c3k2_0"]
    hidden4 = 4 * int(cfg.ch(256) * 0.25)
    y = _cba_s2d(y, cp["cv1"], cs["cv1"], "pw", dt, bdt)
    parts = [y[..., :hidden4], y[..., hidden4:]]
    for i in range(cfg.depth(2)):
        parts.append(_bottleneck_s2d(parts[-1], cp[f"m{i}"], cs[f"m{i}"], dt, bdt))
    y = jnp.concatenate(parts, axis=-1)
    y = _cba_s2d(y, cp["cv2"], cs["cv2"], "pw", dt, bdt)

    return depth_to_space(y, 2)
