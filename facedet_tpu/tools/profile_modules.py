"""Module-level device-time profile of the YOLO tile forward.

profile_stages.py attributes the fused pipeline's time to coarse stages and
shows `convs` dominating (~5.3 ms/img of 8.2). This tool breaks `convs` down
by network section — backbone / neck / head — and A/Bs head variants (pose
branch off, depthwise-cls replaced by a dense conv of identical output shape)
to locate MXU-unfriendly layers. Timing-only: variant params are random; no
accuracy claim. Run on the real TPU: python -m facedet_tpu.tools.profile_layers
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _kdiff_ms(fn, args, k: int = 9, rounds: int = 5, label: str = ""):
    """Median K-difference device ms per call of fn(*args) (fn jitted,
    scalar-reduced via an n-repeat fori_loop keyed on a traced perturbation)."""

    @jax.jit
    def repeat(n, *args):
        def body(i, acc):
            a0 = args[0].at[(0,) * args[0].ndim].set(
                (i % 101).astype(args[0].dtype)
            )
            return acc + fn(a0, *args[1:])

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def timed(n):
        t0 = time.perf_counter()
        float(repeat(n, *args))
        return time.perf_counter() - t0

    t0 = time.perf_counter()
    timed(1)
    compile_s = time.perf_counter() - t0
    diffs = sorted(
        d for d in ((timed(k) - timed(1)) / (k - 1) for _ in range(rounds)) if d > 0
    )
    ms = diffs[len(diffs) // 2] * 1e3 if diffs else float("nan")
    print(f"{label:28s} {ms:9.2f} ms/call  (compile {compile_s:.1f}s, "
          f"{len(diffs)}/{rounds} positive)", flush=True)
    return ms


class DenseClsHead(nn.Module):
    """DetectHead with the depthwise cls pair replaced by ONE dense 3x3 conv
    per level (same in/out channels) — isolates the depthwise-on-VPU cost."""

    chans: tuple

    @nn.compact
    def __call__(self, feats):
        from facedet_tpu.models.layers import ConvBnAct

        outs = []
        for i, f in enumerate(feats):
            cls = ConvBnAct(f.shape[-1], 3, dtype=jnp.bfloat16,
                            bn_dtype=jnp.bfloat16, name=f"cls{i}_dense")(f)
            cls = nn.Conv(1, (1, 1), dtype=jnp.bfloat16, name=f"cls{i}_out")(cls)
            outs.append(cls.astype(jnp.float32))
        return outs


def main(n_tiles: int = 48):
    from facedet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from facedet_tpu.models.yolov11 import (
        Backbone,
        DetectHead,
        PanNeck,
        YoloConfig,
    )

    rng = jax.random.PRNGKey(0)
    cfg = YoloConfig(scale="s", dtype="bfloat16", bn_dtype="bfloat16")
    cfg_np = YoloConfig(scale="s", dtype="bfloat16", bn_dtype="bfloat16",
                        with_pose=False)

    def tsum(t):
        return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(t))

    x = jnp.asarray(
        np.random.default_rng(0).random((n_tiles, 640, 640, 3)), jnp.bfloat16
    )

    bb = Backbone(cfg)
    bb_vars = jax.jit(lambda: bb.init(rng, x[:1], train=False))()
    feats_shape = jax.eval_shape(
        lambda v, x: bb.apply(v, x, train=False), bb_vars, x
    )
    print(f"tile batch [{n_tiles},640,640,3]; feature shapes "
          f"{[tuple(f.shape) for f in feats_shape]}")

    ms_bb = _kdiff_ms(
        lambda a, v: tsum(bb.apply(v, a, train=False)), (x, bb_vars),
        label="backbone (full)",
    )

    feats = jax.jit(lambda v, x: bb.apply(v, x, train=False))(bb_vars, x)
    feats = jax.tree.map(jax.block_until_ready, feats)

    neck = PanNeck(cfg)
    neck_vars = jax.jit(
        lambda: neck.init(rng, jax.tree.map(lambda f: f[:1], feats), train=False)
    )()
    ms_neck = _kdiff_ms(
        lambda p3, p4, p5, v: tsum(neck.apply(v, (p3, p4, p5), train=False)),
        (*feats, neck_vars), label="neck (PAN)",
    )

    nfeats = jax.jit(lambda v, f: neck.apply(v, f, train=False))(neck_vars, feats)
    nfeats = jax.tree.map(jax.block_until_ready, nfeats)

    for name, c in (("head (pose)", cfg), ("head (no pose)", cfg_np)):
        hd = DetectHead(c)
        hd_vars = jax.jit(
            lambda hd=hd: hd.init(rng, jax.tree.map(lambda f: f[:1], nfeats),
                                  train=False)
        )()
        _kdiff_ms(
            lambda p3, p4, p5, v, hd=hd: tsum(
                hd.apply(v, (p3, p4, p5), train=False)
            ),
            (*nfeats, hd_vars), label=name,
        )

    dh = DenseClsHead(tuple(f.shape[-1] for f in nfeats))
    dh_vars = jax.jit(
        lambda: dh.init(rng, jax.tree.map(lambda f: f[:1], nfeats))
    )()
    _kdiff_ms(
        lambda p3, p4, p5, v: tsum(dh.apply(v, (p3, p4, p5))),
        (*nfeats, dh_vars), label="cls-only dense 3x3 (A/B)",
    )

    print(f"\nper-image (6 tiles): backbone {ms_bb / n_tiles * 6:.2f} "
          f"neck {ms_neck / n_tiles * 6:.2f} ms")


if __name__ == "__main__":
    main()
