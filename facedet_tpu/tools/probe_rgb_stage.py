"""Bisect the device cost of the YUV->RGB canvas stage (~0.37 ms/img in the
round-3 stage profile) and A/B cheaper formulations. K-difference timing on
the real TPU, same method as tools/probe_idct_layout.py.

Variants:
  current      ops/color.yuv420_to_rgb_f32 (bilinear up2x + stack + 3x3 matmul)
  planar_fma   same bilinear upsample, but the BT.601 mix written as per-plane
               fused multiply-adds (no [H,W,3]@[3,3] dot on a 3-wide minor dim)
  fma_noclip   planar_fma without the final [0,1] clip (measures clip cost;
               NOT fidelity-equivalent for out-of-gamut pixels)
  nearest_fma  planar FMA with nearest (repeat) chroma doubling instead of
               bilinear (fidelity-changing; measurement only)

Run: python -m facedet_tpu.tools.probe_rgb_stage
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from facedet_tpu.utils.cache import enable_compilation_cache
from facedet_tpu.ops.color import _INV, _up2x_axis, yuv420_to_rgb_f32


def kdiff(fn, args, k=9, rounds=5):
    @jax.jit
    def rep(n, *a):
        def body(i, acc):
            return acc + fn(i, *a)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def timed(n):
        t0 = time.perf_counter()
        float(rep(n, *args))
        return time.perf_counter() - t0

    timed(1)
    diffs = sorted(
        d for d in ((timed(k) - timed(1)) / (k - 1) for _ in range(rounds)) if d > 0
    )
    return diffs[len(diffs) // 2] * 1e3 if diffs else float("nan")


def _mix_fma(yf, cb, cr, dt):
    # BT.601 coefficients taken from the production matrix so the FMA
    # variants can never desynchronize from ops/color's conversion
    r = yf + jnp.asarray(_INV[0, 2], dt) * cr
    g = yf + jnp.asarray(_INV[1, 1], dt) * cb + jnp.asarray(_INV[1, 2], dt) * cr
    b = yf + jnp.asarray(_INV[2, 1], dt) * cb
    return jnp.stack([r, g, b], axis=-1)


def main(h: int = 1024, w: int = 1536, batch: int = 8, dt=jnp.bfloat16):
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    y = jax.device_put(
        jnp.asarray(rng.integers(0, 256, (batch, h, w)), dt)
    )
    uv = jax.device_put(
        jnp.asarray(rng.integers(0, 256, (batch, h // 2, w // 2, 2)), dt)
    )
    jax.block_until_ready(uv)

    def vary(i, x):
        return x.at[(0,) * x.ndim].set((i % 3).astype(x.dtype))

    def current(i, y, uv):
        out = jax.vmap(lambda a, b: yuv420_to_rgb_f32(a, b, out_dtype=dt))(
            vary(i, y), uv
        )
        return jnp.sum(out.astype(jnp.float32))

    def planar_fma(i, y, uv):
        def one(yy, uvv):
            up = _up2x_axis(_up2x_axis(uvv, 0), 1) - jnp.asarray(128.0, dt)
            rgb = _mix_fma(yy, up[..., 0], up[..., 1], dt)
            return jnp.clip(rgb / 255.0, 0.0, 1.0)

        out = jax.vmap(one)(vary(i, y), uv)
        return jnp.sum(out.astype(jnp.float32))

    def fma_noclip(i, y, uv):
        def one(yy, uvv):
            up = _up2x_axis(_up2x_axis(uvv, 0), 1) - jnp.asarray(128.0, dt)
            rgb = _mix_fma(yy, up[..., 0], up[..., 1], dt)
            return rgb / 255.0

        out = jax.vmap(one)(vary(i, y), uv)
        return jnp.sum(out.astype(jnp.float32))

    def nearest_fma(i, y, uv):
        def one(yy, uvv):
            up = jnp.repeat(jnp.repeat(uvv, 2, axis=0), 2, axis=1) - jnp.asarray(
                128.0, dt
            )
            rgb = _mix_fma(yy, up[..., 0], up[..., 1], dt)
            return jnp.clip(rgb / 255.0, 0.0, 1.0)

        out = jax.vmap(one)(vary(i, y), uv)
        return jnp.sum(out.astype(jnp.float32))

    for name, fn in [
        ("current (stack + 3x3 matmul)", current),
        ("planar FMA mix", planar_fma),
        ("planar FMA, no clip", fma_noclip),
        ("nearest chroma + FMA", nearest_fma),
    ]:
        ms = kdiff(fn, (y, uv))
        print(f"{name:30s} {ms / batch:8.4f} ms/img", flush=True)


if __name__ == "__main__":
    main()
