"""Probe: candidate space-to-depth rewrites of the slow early YOLO layers.

profile_layers.py showed stem+down1+c3k2_0 = 0.53 of 0.77 ms/tile at
1-8 TFLOP/s. Each candidate below is the conv shape the s2d-rewritten layer
would run; if the MXU-friendly forms hit their expected throughput the
rewrite is worth building.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from facedet_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

DN = ("NHWC", "HWIO", "NHWC")


def bench(name, b, h, w, cin, cout, k, stride, dt=jnp.bfloat16, reps=9, rounds=5):
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(rng.standard_normal((b, h, w, cin)), dt))
    kr = jax.device_put(jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.05, dt))
    dn = jax.lax.conv_dimension_numbers(x.shape, kr.shape, DN)
    pad = ((k // 2, k // 2),) * 2

    @jax.jit
    def rep(n, x, kr):
        def body(i, acc):
            xi = x.at[0, 0, 0, 0].set((i % 3).astype(x.dtype))
            y = jax.lax.conv_general_dilated(
                xi, kr, (stride, stride), pad, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            )
            return acc + y.sum()

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def timed(n):
        t0 = time.perf_counter()
        float(rep(n, x, kr))
        return time.perf_counter() - t0

    try:
        timed(1)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__} {str(e)[:120]}")
        return
    diffs = sorted(d for d in ((timed(reps) - timed(1)) / (reps - 1) for _ in range(rounds)) if d > 0)
    if not diffs:
        print(f"{name}: no positive diffs")
        return
    ms = diffs[len(diffs) // 2] * 1e3
    fl = 2 * b * (h // stride) * (w // stride) * k * k * cin * cout
    print(f"{name:44s} {ms / 42:8.4f} ms/tile  {fl / (ms / 1e3) / 1e12:7.1f} TF/s")


B = 42
print("-- current early layers")
bench("stem 640x3 ->32 3x3 s2", B, 640, 640, 3, 32, 3, 2)
bench("down1 320x32 ->64 3x3 s2", B, 320, 320, 32, 64, 3, 2)
bench("c3k2_0 inner 160x32->16 3x3", B, 160, 160, 32, 16, 3, 1)
bench("c3k2_0 inner 160x16->32 3x3", B, 160, 160, 16, 32, 3, 1)
bench("c3k2_0 cv1 160x64->64 1x1", B, 160, 160, 64, 64, 1, 1)
bench("c3k2_0 cv2 160x96->128 1x1", B, 160, 160, 96, 128, 1, 1)
bench("down2 160x128->128 3x3 s2", B, 160, 160, 128, 128, 3, 2)

print("-- s2d candidates")
bench("stem' s2d4->s2d2 160x48->128 2x2", B, 160, 160, 48, 128, 2, 1)
bench("stem' s2d2->s2d2 320x12->128 3x3 s2", B, 320, 320, 12, 128, 3, 2)
bench("down1' s2d2->nat 160x128->64 2x2", B, 160, 160, 128, 64, 2, 1)
bench("down1' s2d2->s2d2 80x128->256 3x3 s2... ", B, 160, 160, 128, 256, 3, 2)
bench("c3k2_0' inner s2d2 80x128->64 3x3", B, 80, 80, 128, 64, 3, 1)
bench("c3k2_0' inner s2d2 80x64->128 3x3", B, 80, 80, 64, 128, 3, 1)
bench("c3k2_0' cv1 s2d2 80x256->256 1x1", B, 80, 80, 256, 256, 1, 1)
bench("c3k2_0' cv2 s2d2 80x384->512 1x1", B, 80, 80, 384, 512, 1, 1)
bench("down2' s2d2->nat 80x512->128 2x2", B, 80, 80, 512, 128, 2, 1)

print("-- s2d data movement cost")
rng = np.random.default_rng(0)
x = jax.device_put(jnp.asarray(rng.standard_normal((B, 640, 640, 3)), jnp.float32))


@jax.jit
def s2d4(n, x):
    def body(i, acc):
        xi = x.at[0, 0, 0, 0].set((i % 3).astype(x.dtype))
        b, h, w, c = xi.shape
        y = xi.reshape(b, h // 4, 4, w // 4, 4, c).transpose(0, 1, 3, 2, 4, 5)
        y = y.reshape(b, h // 4, w // 4, 16 * c).astype(jnp.bfloat16)
        return acc + y.astype(jnp.float32).sum()

    return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))


def timed(n):
    t0 = time.perf_counter()
    float(s2d4(n, x))
    return time.perf_counter() - t0


timed(1)
diffs = sorted(d for d in ((timed(9) - timed(1)) / 8 for _ in range(5)) if d > 0)
if diffs:
    print(f"{'s2d4 rearrange 640x3 f32->bf16':44s} {diffs[len(diffs) // 2] / 42 * 1e3:8.4f} ms/tile")
