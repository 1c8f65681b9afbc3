"""A/B the predict_stream_batched in-flight window (2 vs 3 vs 4) in one
process — same link phase — at the bench serving configuration.

The steady-state legs (BENCH.md two-stage worker section) are host stage,
upload, and dispatch+fetch; window=2 keeps one batch of slack between the
upload thread and the fetching main thread. A deeper window can only help if
scheduling jitter (not bandwidth) leaves the device idle between batches.

Run on the real TPU: python -m facedet_tpu.tools.probe_stream_window
"""
from __future__ import annotations

import time

import numpy as np


def _make_image(h, w):
    """Natural-statistics synthetic image (multi-scale smooth noise) — same
    texture as the bench generator, inlined so the probe runs from any cwd."""
    rng = np.random.default_rng(0)
    base = np.zeros((h, w), np.float32)
    for octave in (8, 32, 128):
        up = np.kron(
            rng.standard_normal((octave, octave)).astype(np.float32),
            np.ones((-(-h // octave), -(-w // octave)), np.float32),
        )[:h, :w]
        base += up / octave**0.5
    base = (base - base.min()) / (base.max() - base.min())
    return np.stack([base * 255, base * 230 + 10, base * 210 + 25], -1).astype(np.uint8)


def main(bsz: int = 64, batches: int = 5, image_hw=(1024, 1536)):
    from facedet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from facedet_tpu.engine.detector import YoloV11PoseDetectionModel
    from facedet_tpu.engine.predict import predict_stream_batched
    from facedet_tpu.ops.jpeg_dct import encode_dct420

    model = YoloV11PoseDetectionModel(
        scale="s", dtype="bfloat16", confidence_threshold=0.25,
        image_size=640, max_detections_per_tile=300,
    )
    img = _make_image(*image_hw)
    planes = encode_dct420(img, quality=90)
    cfg = dict(
        slice_height=640, slice_width=640,
        overlap_height_ratio=0.2, overlap_width_ratio=0.2,
        perform_standard_pred=True, postprocess_type="GREEDYNMM",
        postprocess_match_metric="IOS", postprocess_match_threshold=0.5,
        postprocess_class_agnostic=True, input_format="dct420s",
        fetch_capacity=300,
    )

    # warm compile once
    for _ in predict_stream_batched([planes] * bsz, model, batch_size=bsz,
                                    window=2, raw=True, **cfg):
        pass

    n = batches * bsz
    windows = (2, 3, 4)
    for _round in range(3):
        # rotate the measurement order per round: the link's health drifts on
        # a minutes timescale, and a fixed order would systematically favor
        # whichever window always ran last
        order = windows[_round % 3:] + windows[:_round % 3]
        for w in order:
            t0 = time.perf_counter()
            done = 0
            for batch in predict_stream_batched(
                [planes] * n, model, batch_size=bsz, window=w, raw=True, **cfg
            ):
                done += int(batch.scores.shape[0])
            dt = time.perf_counter() - t0
            print(f"round {_round} window={w}: {done / dt:7.2f} img/s "
                  f"({dt / batches:.3f} s/batch)", flush=True)


if __name__ == "__main__":
    main()
