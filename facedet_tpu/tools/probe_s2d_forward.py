"""A/B the full tile_forward on the real TPU: s2d early path vs standard.

K-difference timing (cancels tunnel RTT). Run: python -m facedet_tpu.tools.probe_s2d_forward
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from facedet_tpu.utils.cache import enable_compilation_cache


def main(tiles: int = 42, size: int = 640, k: int = 9, rounds: int = 7):
    enable_compilation_cache()
    from facedet_tpu.engine import predict as P
    from facedet_tpu.engine.detector import YoloV11PoseDetectionModel

    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(rng.random((tiles, size, size, 3), np.float32)))
    jax.block_until_ready(x)

    models = {}
    for bn in ("float32", "bfloat16"):
        models[bn] = YoloV11PoseDetectionModel(
            scale="s", dtype="bfloat16", bn_dtype=bn, confidence_threshold=0.25,
            image_size=size, max_detections_per_tile=300,
        )

    for mode, (bn, s2d) in {
        "standard": ("float32", False),
        "s2d": ("float32", True),
        "s2d+bnbf16": ("bfloat16", True),
    }.items():
        model = models[bn]
        variables = P._resident_variables(model)
        model.s2d_early = s2d

        @jax.jit
        def rep(n, variables, x):
            def body(i, acc):
                xi = x.at[0, 0, 0, 0].set((i % 101).astype(x.dtype) / 101.0)
                det = model.tile_forward(variables, xi, 0.25)
                return acc + jnp.sum(det.scores.astype(jnp.float32))

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        def timed(n):
            t0 = time.perf_counter()
            float(rep(n, variables, x))
            return time.perf_counter() - t0

        t0 = time.perf_counter()
        timed(1)
        compile_s = time.perf_counter() - t0
        diffs = sorted(
            d for d in ((timed(k) - timed(1)) / (k - 1) for _ in range(rounds)) if d > 0
        )
        if not diffs:
            print(f"{mode}: no positive diffs")
            continue
        lo, med, hi = diffs[0], diffs[len(diffs) // 2], diffs[-1]
        print(
            f"{mode:9s} {med / tiles * 1e3:7.4f} ms/tile  "
            f"(spread {lo / tiles * 1e3:.4f}-{hi / tiles * 1e3:.4f}, compile {compile_s:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
