"""Stage breakdown of the SR serving path (enhance_to_jpeg, sparse fetch).

BENCH_r04 recorded sr_images_per_sec 0.206 = 4.85 s/image end-to-end against
1.69 s of device time — over 3 s/image of host+link cost that the
K-difference device timing cannot see (CLAUDE.md: it cancels per-dispatch
constants). This probe splits ONE warm enhance-to-jpeg cycle into its exact
stages so the residual is attributed, not guessed:

  load      file -> bucket-padded device upload  (_load_bucketed)
  dispatch  pipeline() call + n_clipped scalar sync (device wait)
  fetch     np.asarray of the sparse planes (link download)
  unpack    host sparse bitmap -> flat coefficients (numpy)
  wire      flat planes -> DCT image struct
  write     native entropy code -> .jpg

Run (TPU): python -m facedet_tpu.tools.probe_sr_e2e [--scale 4] [--n 3]
"""
from __future__ import annotations

import argparse
import os
import tempfile
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--hw", default="512,768")
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--quality", type=int, default=95)
    args = ap.parse_args(argv)
    h, w = (int(x) for x in args.hw.split(","))

    import jax.numpy as jnp
    import numpy as np

    from facedet_tpu.engine.enhancer import FaceEnhancer
    from facedet_tpu.utils.cache import enable_compilation_cache
    from facedet_tpu.utils.viz import save_image

    enable_compilation_cache()
    from bench import _make_image  # natural-statistics test image

    name = "RealESRGAN_x4plus" if args.scale == 4 else "RealESRGAN_x2plus"
    enh = FaceEnhancer(model_name=name, outscale=float(args.scale),
                       tile=400, tile_pad=10, half=True)
    img = _make_image(h, w)
    tmp = tempfile.mkdtemp(prefix="probe_sr_e2e_")
    src = os.path.join(tmp, "in.jpg")
    save_image(src, img, quality=92)

    # end-to-end reference number (the bench's sr_images_per_sec loop)
    enh.enhance_to_jpeg(src, os.path.join(tmp, "warm.jpg"), sparse=True)
    t0 = time.perf_counter()
    for i in range(args.n):
        enh.enhance_to_jpeg(src, os.path.join(tmp, f"e{i}.jpg"), sparse=True)
    e2e = (time.perf_counter() - t0) / args.n
    print(f"e2e enhance_to_jpeg: {e2e*1e3:.0f} ms/img "
          f"({1.0/e2e:.3f} img/s)")

    # staged breakdown of the same cycle
    from facedet_tpu.data.native_loader import save_dct420_jpeg
    from facedet_tpu.ops.jpeg_dct import (
        unpack_sparse_bitmap_np,
        wire_planes_to_dct_image,
    )

    stages = {k: 0.0 for k in
              ("load", "dispatch", "fetch", "unpack", "wire", "write")}
    for i in range(args.n):
        t = time.perf_counter()
        x, th_, tw_ = enh._load_bucketed(src)
        x.block_until_ready()
        stages["load"] += time.perf_counter() - t

        bh, bw = int(x.shape[0]), int(x.shape[1])
        sc = float(args.scale)
        pipeline, qy, qc, _ = enh._enhance_dct_pipeline(
            bh, bw, sc, args.quality, sparse=True)
        t = time.perf_counter()
        out = pipeline(enh.variables, x)
        n_clipped = int(out[-1])  # scalar sync = device wait
        stages["dispatch"] += time.perf_counter() - t

        t = time.perf_counter()
        y_dc, uv_dc, bitmap, vals, nnz, _ = out
        y_dc, uv_dc, bitmap, vals = (np.asarray(a) for a in
                                     (y_dc, uv_dc, bitmap, vals))
        nnz = int(nnz)
        stages["fetch"] += time.perf_counter() - t

        t = time.perf_counter()
        yb_h, yb_w = y_dc.shape
        cb_h, cb_w = uv_dc.shape[:2]
        ny = 64 * yb_h * yb_w
        flat = unpack_sparse_bitmap_np(bitmap, vals,
                                       ny + 2 * 64 * cb_h * cb_w)
        planes = (y_dc, flat[:ny].reshape(64, yb_h, yb_w), uv_dc,
                  flat[ny:].reshape(2, 64, cb_h, cb_w))
        stages["unpack"] += time.perf_counter() - t

        t = time.perf_counter()
        th2, tw2 = int(round(th_ * sc)), int(round(tw_ * sc))
        d = wire_planes_to_dct_image(planes, qy, qc, (th2, tw2))
        stages["wire"] += time.perf_counter() - t

        t = time.perf_counter()
        ok = save_dct420_jpeg(os.path.join(tmp, f"s{i}.jpg"), d)
        stages["write"] += time.perf_counter() - t
        if i == 0:
            print(f"  [native_write={ok} n_clipped={n_clipped} "
                  f"nnz={nnz} cap={vals.shape[0]} "
                  f"density={nnz/(64*yb_h*yb_w + 128*cb_h*cb_w):.3f}]")

    total = 0.0
    for k, v in stages.items():
        print(f"  {k:9s} {v/args.n*1e3:8.1f} ms/img")
        total += v / args.n
    print(f"  {'sum':9s} {total*1e3:8.1f} ms/img  (e2e was {e2e*1e3:.0f})")
    nbytes = bitmap.nbytes + vals.nbytes + y_dc.nbytes + uv_dc.nbytes
    print(f"fetch bytes/img: {nbytes/1e6:.2f} MB  nnz {nnz}")


if __name__ == "__main__":
    main()
