"""Probe: per-batch upload cost of the dct420s staged tuple (6 arrays) vs a
single packed wire buffer, on the real TPU link.

The staged tuple is uploaded as 6 jnp.asarray transfers per 64-image batch;
each transfer pays tunnel setup/RTT. This probe measures whether fusing the
host-side views into ONE contiguous uint8 wire (one transfer + device-side
bitcast unpack) is worth it.

Run: python -m facedet_tpu.tools.probe_upload_pack
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from facedet_tpu.utils.cache import enable_compilation_cache


def sync(x):
    # on axon only a host fetch truly syncs small programs
    return float(jnp.asarray(x).ravel()[0])


def main(bsz: int = 64, h: int = 1024, w: int = 1536, rounds: int = 5):
    enable_compilation_cache()
    import bench
    from facedet_tpu.engine import predict as P
    from facedet_tpu.ops.jpeg_dct import encode_dct420

    img = bench._make_image(h, w)
    planes = encode_dct420(img)
    bucket_h, bucket_w = 1024, 1536
    from facedet_tpu.ops.jpeg_dct import wire_unpack_dct420s_np

    wire0 = P._stage_batch_host([planes] * bsz, "dct420s", bucket_h, bucket_w)
    staged = wire_unpack_dct420s_np(wire0, bsz, bucket_h, bucket_w)
    names = ["y_dc", "uv_dc", "qy", "qc", "deltas", "vals"]
    for nm, a in zip(names, staged):
        print(f"{nm:8s} {a.dtype} {a.shape} {a.nbytes/1e6:.2f} MB")
    total = sum(a.nbytes for a in staged)
    print(f"total {total/1e6:.2f} MB")

    touch = jax.jit(lambda *xs: sum(x.ravel()[:16].astype(jnp.float32).sum() for x in xs))

    def t_tuple():
        t0 = time.perf_counter()
        devs = tuple(jnp.asarray(a) for a in staged)
        sync(touch(*devs))
        return time.perf_counter() - t0

    wire = np.concatenate([np.ascontiguousarray(a).view(np.uint8).ravel() for a in staged])
    print(f"wire {wire.nbytes/1e6:.2f} MB")

    def t_wire_concat():
        t0 = time.perf_counter()
        w_ = np.concatenate(
            [np.ascontiguousarray(a).view(np.uint8).ravel() for a in staged]
        )
        dev = jnp.asarray(w_)
        sync(touch(dev))
        return time.perf_counter() - t0

    def t_wire_upload_only():
        t0 = time.perf_counter()
        dev = jnp.asarray(wire)
        sync(touch(dev))
        return time.perf_counter() - t0

    for name, fn in [
        ("tuple of 6 (current)", t_tuple),
        ("one wire incl. host concat", t_wire_concat),
        ("one wire upload only", t_wire_upload_only),
    ]:
        fn()  # warm/compile
        ts = sorted(fn() for _ in range(rounds))
        print(f"{name:28s} {ts[len(ts)//2]:.3f} s/batch (min {ts[0]:.3f})", flush=True)


if __name__ == "__main__":
    main()
