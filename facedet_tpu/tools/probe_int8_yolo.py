"""int8 serving A/B on the real TPU: accuracy parity + device speed.

Concludes ``probe_int8_conv`` (raw int8 conv is 1.6-3.6x bf16 on the MXU)
into a serving decision:

1. **Accuracy**: golden-reference parity (recall/precision vs the
   reference's committed detections) with the trained yolo11n checkpoint,
   bf16 vs int8 quantized via ``models/quantize`` calibrated on the golden
   photos themselves.
2. **Speed**: K-difference device time of ``tile_forward`` on the serving
   tile batch, bf16 vs int8, same weights.

Run (TPU): python -m facedet_tpu.tools.probe_int8_yolo
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def device_time_tile_forward(det, n_tiles: int, reps: int = 6, rounds: int = 5):
    """Median positive K-difference of a jitted tile_forward on [n_tiles,
    640, 640, 3] natural-stat tiles (per-iteration tweak defeats hoisting;
    scalar-reduced output syncs through a fetch)."""
    import jax
    import jax.numpy as jnp

    from facedet_tpu.models.quantize import _natural_tile

    size = det.image_size
    tiles_np = np.stack(
        [_natural_tile(size, seed=i).astype(np.float32) / 255.0 for i in range(n_tiles)]
    )
    tiles = jax.device_put(jnp.asarray(tiles_np, jnp.bfloat16))
    variables = jax.device_put(det.variables)

    @jax.jit
    def rep(n, variables, tiles):
        def body(i, acc):
            t = tiles.at[0, 0, 0, 0].set((i % 5).astype(tiles.dtype) / 5.0)
            out = det.tile_forward(variables, t, 0.25)
            return acc + sum(
                v.astype(jnp.float32).sum() for v in jax.tree.leaves(out)
            )

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def timed(n):
        t0 = time.perf_counter()
        float(rep(n, variables, tiles))
        return time.perf_counter() - t0

    timed(1)  # compile + warm
    diffs = sorted(
        d for d in ((timed(reps) - timed(1)) / (reps - 1) for _ in range(rounds))
        if d > 0
    )
    return diffs[len(diffs) // 2] if diffs else None


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--scale", default="n", help="model scale for BOTH arms")
    ap.add_argument("--conf", type=float, default=0.35)
    ap.add_argument("--iou", type=float, default=0.5)
    ap.add_argument("--tiles", type=int, default=42)
    ap.add_argument("--skip-parity", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    from facedet_tpu.engine.detector import YoloV11PoseDetectionModel
    from facedet_tpu.models.quantize import calibrate, quantize_variables
    from facedet_tpu.tools.golden_finetune import (
        GOLDENS_PATH, REF_DIR, load_golden_dataset, parity_on_split,
    )
    from facedet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    ckpt = GOLDENS_PATH.replace("reference_goldens.json", "yolo11n_golden.npz")
    report = {"checkpoint": ckpt, "scale": args.scale}

    det = YoloV11PoseDetectionModel(
        scale=args.scale, dtype="bfloat16", confidence_threshold=0.25,
        image_size=640, max_detections_per_tile=300,
        model_path=ckpt if args.scale == "n" else None,
    )
    det.load_model()
    bf16_vars = det.variables

    # calibrate on real photos: letterboxed golden tiles through the model's
    # own preprocessing scale (simple resize-pad to 640 here)
    records = load_golden_dataset(min_conf=0.2)
    cpu = jax.local_devices(backend="cpu")[0]
    batches = []
    for r in records[:6]:
        img = r["image"].astype(np.float32) / 255.0
        s = 640.0 / max(img.shape[:2])
        h, w = int(img.shape[0] * s), int(img.shape[1] * s)
        from PIL import Image

        small = np.asarray(
            Image.fromarray(r["image"]).resize((w, h), Image.BILINEAR),
            np.float32,
        ) / 255.0
        tile = np.zeros((640, 640, 3), np.float32)
        tile[:h, :w] = small
        batches.append(tile[None])
    with jax.default_device(cpu):
        absmax = calibrate(det.model, bf16_vars, batches)
        int8_vars = quantize_variables(bf16_vars, absmax)
    n_q = sum(x.dtype == np.int8 for x in jax.tree.leaves(int8_vars["params"])
              if hasattr(x, "dtype"))
    report["quantized_convs"] = int(n_q)
    print(f"quantized {n_q} convs")

    if not args.skip_parity and args.scale == "n":
        goldens = json.load(open(GOLDENS_PATH))
        r_bf16 = parity_on_split(det, goldens, records, REF_DIR, args.conf, args.iou)
        det.variables = int8_vars
        det.__dict__.pop("_resident_vars", None)
        r_int8 = parity_on_split(det, goldens, records, REF_DIR, args.conf, args.iou)
        det.variables = bf16_vars
        report["parity"] = {
            "bf16": {"recall": r_bf16["recall"], "precision": r_bf16["precision"]},
            "int8": {"recall": r_int8["recall"], "precision": r_int8["precision"]},
        }
        print(f"parity bf16: recall {r_bf16['recall']:.4f} prec {r_bf16['precision']:.4f}")
        print(f"parity int8: recall {r_int8['recall']:.4f} prec {r_int8['precision']:.4f}")

    det.variables = bf16_vars
    t_bf16 = device_time_tile_forward(det, args.tiles)
    det.variables = int8_vars
    t_int8 = device_time_tile_forward(det, args.tiles)
    report["device"] = {
        "tiles": args.tiles,
        "bf16_ms_per_batch": round(t_bf16 * 1e3, 3) if t_bf16 else None,
        "int8_ms_per_batch": round(t_int8 * 1e3, 3) if t_int8 else None,
        "speedup": round(t_bf16 / t_int8, 3) if t_bf16 and t_int8 else None,
    }
    print(f"tile_forward[{args.tiles}] bf16 {t_bf16 and t_bf16 * 1e3:.2f} ms  "
          f"int8 {t_int8 and t_int8 * 1e3:.2f} ms  "
          f"speedup {t_bf16 and t_int8 and t_bf16 / t_int8:.2f}x")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
