"""A/B the SR tile plan at the bench shape (VERDICT r4 directive 2).

At 512x768 the production plan (tile 400 / pad 10) pads the image to an
800x800 grid and runs FOUR 420^2 halo tiles — 705,600 computed pixels for
393,216 real ones (1.79x FLOPs waste). This probe K-difference-times the x4
RRDBNet-23 over candidate plans on the real TPU:

  tiled400    production plan: 4 x 420^2 windows, one batch-4 dispatch
  whole       single [1,512,768] dispatch, no halo, no grid padding
  rows2       2 x [532?] .. per-axis grid: 1x2 grid of 512x(384+2p) windows
  whole_bf16w weights pre-cast to bf16 on device (measures the f32->bf16
              weight-cast overhead inside the jit, if any)

Also reports max|diff| of the stitched outputs vs the whole-image result
(seam-local reflect-pad differences only) so fidelity parity is on record.

Run: python -m facedet_tpu.tools.probe_sr_tiling
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from facedet_tpu.engine.enhancer import FaceEnhancer, tiled_sr
from facedet_tpu.utils.cache import enable_compilation_cache


def time_pipeline(fn, variables, image, k: int = 5, rounds: int = 3):
    """Median wall of a warm fused dispatch, synced through a fetched scalar
    (block_until_ready can return early on axon for small outputs)."""
    @jax.jit
    def reduced(v, im):
        return fn(v, im).sum()

    float(reduced(variables, image))  # compile + warm
    times = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(k):
            s = float(reduced(variables, image))
        times.append((time.perf_counter() - t0) / k)
    return sorted(times)[len(times) // 2], s


def main(h: int = 512, w: int = 768):
    enable_compilation_cache()
    enh = FaceEnhancer("RealESRGAN_x4plus")
    model, variables = enh.model, enh.variables
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (h, w, 3)), jnp.float32)
    dev = jax.devices()[0]
    img = jax.device_put(img, dev)
    variables = jax.device_put(variables, dev)

    def net(v, x):
        return jnp.clip(model.apply(v, x), 0.0, 1.0)

    def legacy_square(v, im, tile=400, tile_pad=10, chunk_max=8):
        """The pre-r5 fixed square grid (4 x 420^2 at 512x768)."""
        hh, ww = im.shape[0], im.shape[1]
        gh, gw = -(-hh // tile), -(-ww // tile)
        ph, pw = gh * tile, gw * tile
        padded = jnp.pad(
            im, ((tile_pad, ph - hh + tile_pad),
                 (tile_pad, pw - ww + tile_pad), (0, 0)), mode="reflect")
        win = tile + 2 * tile_pad
        offs = jnp.asarray(
            [(i * tile, j * tile) for i in range(gh) for j in range(gw)],
            jnp.int32)
        tiles = jax.vmap(lambda o: jax.lax.dynamic_slice(
            padded, (o[0], o[1], 0), (win, win, 3)))(offs)
        out = net(v, tiles)
        p = tile_pad * 4
        core = out[:, p : p + tile * 4, p : p + tile * 4, :]
        core = core.reshape(gh, gw, tile * 4, tile * 4, 3)
        return core.transpose(0, 2, 1, 3, 4).reshape(
            ph * 4, pw * 4, 3)[: hh * 4, : ww * 4]

    plans = {
        "legacy4x420": legacy_square,
        "planned": lambda v, im: tiled_sr(lambda x: net(v, x), im, 4, 400, 10, 8),
        "whole": lambda v, im: net(v, im[None])[0],
    }

    flops_real = 25.7e12 / 1.79  # body+up FLOPs for 512x768, no halo
    results = {}
    for name, fn in plans.items():
        t, _ = time_pipeline(fn, variables, img)
        results[name] = t
        print(f"{name:12s} {t * 1e3:8.1f} ms", flush=True)

    # fidelity parity: stitched vs whole (seam-local reflect differences only)
    out_w = jax.jit(plans["whole"])(variables, img)
    out_t = jax.jit(plans["legacy4x420"])(variables, img)
    d = jnp.abs(out_w - out_t)
    print(f"max|diff| tiled-vs-whole: {float(d.max()):.4f}  "
          f"mean {float(d.mean()):.6f}  "
          f"frac>1/255: {float((d > 1 / 255).mean()):.4f}")
    est = {n: flops_real / t / 197e12 for n, t in results.items()}
    for n in results:
        print(f"{n:12s} MFU_est {est[n]:.3f} (real-pixel flops)")


if __name__ == "__main__":
    main()
