"""Per-layer RRDB profile at the SR serving shape (VERDICT r4 #2).

The planned whole-image x4 dispatch runs at 767 ms / 512x768 image
(true-work MFU 0.095) — ~4x the lane-packing ideal. This profiler
K-difference-times the individual sub-ops on the real TPU to attribute the
residual:

  conv shapes   every distinct conv of the RRDB body/up path at its true
                resolution + a 128-out reference per input width (lane-
                utilization ceiling)
  rdb forms     one ResidualDenseBlock as written (concat -> conv) vs a
                sum-of-convs decomposition (mathematically identical:
                conv(concat(a,b), W) = conv(a, Wa) + conv(b, Wb)) vs a
                leaky-only elementwise baseline
  full blocks   one RRDB (3 RDBs + scale-add) and the 4-conv up path

Run: python -m facedet_tpu.tools.profile_sr_layers
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from facedet_tpu.utils.cache import enable_compilation_cache

LRELU = 0.2


def kdiff(fn, args, k=5, rounds=4):
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
        d for d in ((timed(k) - timed(1)) / (k - 1) for _ in range(rounds))
        if d > 0
    )
    return diffs[len(diffs) // 2] * 1e3 if diffs else float("nan")


def conv_w(rng, cin, cout):
    return jnp.asarray(rng.normal(0, 0.02, (3, 3, cin, cout)), jnp.bfloat16)


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16,
    )


def main(h: int = 512, w: int = 768):
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]

    def mk(hh, ww, c):
        return jax.device_put(
            jnp.asarray(rng.normal(0, 1, (1, hh, ww, c)), jnp.bfloat16), dev
        )

    def vary(i, x):
        return x.at[0, 0, 0, 0].set((i % 3).astype(x.dtype))

    print(f"== single convs at {h}x{w} (body res) ==", flush=True)
    flops_hw = 2 * 9 * h * w
    for cin, cout, tag in [
        (64, 32, "rdb conv1"), (96, 32, "rdb conv2"), (128, 32, "rdb conv3"),
        (160, 32, "rdb conv4"), (192, 64, "rdb conv5"),
        (64, 64, "conv_body"),
        (64, 128, "ref 64->128"), (192, 128, "ref 192->128"),
        (64, 256, "ref 64->256"),
    ]:
        x = mk(h, w, cin)
        wt = jax.device_put(conv_w(rng, cin, cout), dev)
        t = kdiff(lambda i, x_, w_: jnp.sum(conv(vary(i, x_), w_)
                                            .astype(jnp.float32)), (x, wt))
        fl = flops_hw * cin * cout
        print(f"{tag:14s} {cin:3d}->{cout:3d}  {t:7.2f} ms  "
              f"{fl / t / 1e9:6.1f} GF/ms  MFU {fl / (t * 1e-3) / 197e12:.3f}",
              flush=True)

    print("== up-path convs ==", flush=True)
    for hh, ww, cin, cout, tag in [
        (h * 2, w * 2, 64, 64, "conv_up1@2x"),
        (h * 4, w * 4, 64, 64, "conv_up2@4x"),
        (h * 4, w * 4, 64, 64, "conv_hr@4x"),
        (h * 4, w * 4, 64, 3, "conv_last@4x"),
    ]:
        x = mk(hh, ww, cin)
        wt = jax.device_put(conv_w(rng, cin, cout), dev)
        t = kdiff(lambda i, x_, w_: jnp.sum(conv(vary(i, x_), w_)
                                            .astype(jnp.float32)), (x, wt))
        fl = 2 * 9 * hh * ww * cin * cout
        print(f"{tag:14s} {t:7.2f} ms  MFU {fl / (t * 1e-3) / 197e12:.3f}",
              flush=True)

    print("== RDB formulations (one ResidualDenseBlock) ==", flush=True)
    ws = {
        "c1": conv_w(rng, 64, 32), "c2": conv_w(rng, 96, 32),
        "c3": conv_w(rng, 128, 32), "c4": conv_w(rng, 160, 32),
        "c5": conv_w(rng, 192, 64),
    }
    ws = jax.device_put(ws, dev)
    x0 = mk(h, w, 64)

    def act(v):
        return jax.nn.leaky_relu(v, LRELU)

    def rdb_concat(i, x, ws):
        x = vary(i, x)
        x1 = act(conv(x, ws["c1"]))
        x2 = act(conv(jnp.concatenate([x, x1], -1), ws["c2"]))
        x3 = act(conv(jnp.concatenate([x, x1, x2], -1), ws["c3"]))
        x4 = act(conv(jnp.concatenate([x, x1, x2, x3], -1), ws["c4"]))
        x5 = conv(jnp.concatenate([x, x1, x2, x3, x4], -1), ws["c5"])
        return jnp.sum((x + 0.2 * x5).astype(jnp.float32))

    def rdb_sum(i, x, ws):
        x = vary(i, x)
        s = lambda w_, lo, hi: w_[:, :, lo:hi, :]
        x1 = act(conv(x, ws["c1"]))
        x2 = act(conv(x, s(ws["c2"], 0, 64)) + conv(x1, s(ws["c2"], 64, 96)))
        x3 = act(conv(x, s(ws["c3"], 0, 64)) + conv(x1, s(ws["c3"], 64, 96))
                 + conv(x2, s(ws["c3"], 96, 128)))
        x4 = act(conv(x, s(ws["c4"], 0, 64)) + conv(x1, s(ws["c4"], 64, 96))
                 + conv(x2, s(ws["c4"], 96, 128)) + conv(x3, s(ws["c4"], 128, 160)))
        x5 = (conv(x, s(ws["c5"], 0, 64)) + conv(x1, s(ws["c5"], 64, 96))
              + conv(x2, s(ws["c5"], 96, 128)) + conv(x3, s(ws["c5"], 128, 160))
              + conv(x4, s(ws["c5"], 160, 192)))
        return jnp.sum((x + 0.2 * x5).astype(jnp.float32))

    def elementwise_only(i, x, ws):
        x = vary(i, x)
        return jnp.sum(act(x * 0.2 + 0.1).astype(jnp.float32))

    for name, fn in [("rdb_concat", rdb_concat), ("rdb_sum", rdb_sum),
                     ("elementwise", elementwise_only)]:
        t = kdiff(fn, (x0, ws))
        print(f"{name:12s} {t:7.2f} ms", flush=True)

    # theoretical body budget check: 69 RDBs at the measured block time
    t_rdb = kdiff(rdb_concat, (x0, ws))
    print(f"body extrapolation: 69 x rdb_concat = {69 * t_rdb:.0f} ms")


if __name__ == "__main__":
    main()
