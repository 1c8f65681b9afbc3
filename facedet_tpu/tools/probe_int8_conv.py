"""Micro-probe: is int8 conv on the MXU actually faster than bf16 through the
axon remote-compile path? K-difference timing (cancels tunnel RTT)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from facedet_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

DN = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))


def conv(x, k, out_t):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=DN,
        preferred_element_type=out_t,
    )


def bench(name, x, k, out_t, reps=9, rounds=5):
    @jax.jit
    def rep(n, x, k):
        def body(i, acc):
            xi = x.at[0, 0, 0, 0].set((i % 3).astype(x.dtype))
            return acc + conv(xi, k, out_t).astype(jnp.float32).sum()

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def timed(n):
        t0 = time.perf_counter()
        float(rep(n, x, k))
        return time.perf_counter() - t0

    try:
        timed(1)
    except Exception as e:
        print(f"{name}: COMPILE FAILED: {type(e).__name__} {str(e)[:200]}")
        return
    diffs = sorted(d for d in ((timed(reps) - timed(1)) / (reps - 1) for _ in range(rounds)) if d > 0)
    if not diffs:
        print(f"{name}: no positive diffs (link noise)")
        return
    ms = diffs[len(diffs) // 2] * 1e3
    flops = 2 * x.shape[0] * x.shape[1] * x.shape[2] * k.shape[0] * k.shape[1] * k.shape[2] * k.shape[3]
    print(f"{name}: {ms:8.3f} ms  {flops / (ms / 1e3) / 1e12:7.1f} TOP/s")


rng = np.random.default_rng(0)
# representative mid-network shape: 42 tiles x 80x80 x 128ch, 3x3
for (b, h, w, cin, cout) in [(42, 80, 80, 128, 128), (42, 40, 40, 256, 256), (42, 160, 160, 64, 64)]:
    xf = rng.standard_normal((b, h, w, cin)).astype(np.float32)
    kf = rng.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.1
    xb = jax.device_put(jnp.asarray(xf, jnp.bfloat16))
    kb = jax.device_put(jnp.asarray(kf, jnp.bfloat16))
    xi = jax.device_put(jnp.asarray(np.clip(np.round(xf * 20), -127, 127), jnp.int8))
    ki = jax.device_put(jnp.asarray(np.clip(np.round(kf * 100), -127, 127), jnp.int8))
    tag = f"[{b}x{h}x{w}x{cin}->{cout}]"
    bench(f"bf16 {tag}", xb, kb, jnp.float32)
    bench(f"int8 {tag}", xi, ki, jnp.int32)
