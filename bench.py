"""Headline benchmark: WIDERFACE-style images/sec with SAHI 640-pixel slices.

Pipeline per image (the reference's app_yolo_sahi capability, BASELINE.json
config #2): 1024x1536 image -> SAHI 640x640 tiles @ 0.2 overlap (6 tiles +
full-image standard pass) -> YOLOv11-s-pose (bfloat16) over the whole tile
batch in one dispatch -> on-device decode + GreedyNMM merge -> host detection
list. Static shapes; one compile.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} with
transfer/compute accounting:
  - device_ms_per_image: device-only time for the fused batched dispatch with
    inputs already resident on device (no host link in the measurement).
  - bytes_h2d_per_image: the uint8 upload each image costs (bucketed canvas).
  - mfu_est: device-time MFU vs the chip's bf16 peak, from XLA's own FLOPs
    cost analysis of the fused pipeline.
  - baseline_kind: what vs_baseline divides by. The reference stack publishes
    no throughput (BASELINE.md "Operating point & throughput") and torch-CUDA
    isn't runnable here, so the denominator is the SAME pipeline executed with
    JAX on this host's CPU (``python bench.py --cpu``; constant below).

Throughput uses the windowed batched stream (predict_stream_batched,
window=3): the next batches' staging+upload+compute overlap the current
batch's fetch, hiding link latency.
"""
from __future__ import annotations

import argparse
import json
import os
import threading
import time

# best-so-far results, shared with the watchdog (the tunneled TPU link can
# hang outright; a partial number beats an empty driver record)
_PROGRESS = {"ips": 0.0, "p50": None, "complete": False, "extras": {}}

# Measured with `python bench.py --cpu` on this host (see module docstring).
# The CPU reference keeps the CPU-OPTIMAL ingest (yuv420, 0.26 img/s): the
# round-3 dct420 ingest trades host-cheap bytes for device matmuls and runs
# 0.17 img/s on CPU — dividing by the slower same-ingest number would
# inflate the multiplier through an ingest choice made for the TPU link.
CPU_REFERENCE_IPS = 0.26
BASELINE_KIND = "same_pipeline_jax_cpu_this_host"

# bf16 peak of the attached chip generation (axon tunnel reports v5e: 197
# TFLOP/s bf16). Used only for the mfu_est field.
PEAK_BF16_FLOPS = 197e12


def _make_image(h, w):
    """Natural-statistics synthetic image (multi-scale smooth noise):
    photo-like transfer/compression behaviour, unlike pure white noise which
    is the worst case for the host<->TPU link compressor."""
    import numpy as np

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


def _link_probe(sample_bytes: int = 8 << 20, rounds: int = 3):
    """In-bench raw link measurement (VERDICT r2 #1): times a device_put of
    known-size buffers and reports effective H2D MB/s for natural-statistics
    data (compressible, like the bench images) and for random bytes
    (incompressible — the tunnel compresses transfers, so these differ), plus
    the small-transfer round-trip time that bounds per-dispatch overhead.

    Sync note: on the tunneled axon platform only a host fetch truly
    synchronizes, so each upload is timed through a dependent tiny-slice sum
    whose scalar is fetched — the full buffer must be device-resident before
    that result can exist."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    touch = jax.jit(lambda x: x[:64].astype(jnp.float32).sum())

    def timed_upload(arr):
        t0 = time.perf_counter()
        dev = jax.device_put(arr)
        float(touch(dev.ravel()))
        return time.perf_counter() - t0

    rng = np.random.default_rng(1)
    # natural-statistics payload: tile the bench image generator's texture
    nat = _make_image(1024, 1024).ravel()
    nat = np.tile(nat, -(-sample_bytes // nat.size))[:sample_bytes]
    rnd = rng.integers(0, 256, sample_bytes, dtype=np.uint8)
    tiny = np.zeros(128, np.uint8)

    float(touch(jax.device_put(tiny.ravel())))  # compile + warm the touch fn
    rtts = [timed_upload(tiny) for _ in range(rounds * 2)]
    rtt = sorted(rtts)[len(rtts) // 2]
    t_nat = min(timed_upload(nat) for _ in range(rounds))
    t_rnd = min(timed_upload(rnd) for _ in range(rounds))
    mbps = lambda t: round(sample_bytes / max(t - rtt, 1e-9) / 1e6, 1)
    return {
        "link_h2d_mbps_natural": mbps(t_nat),
        "link_h2d_mbps_random": mbps(t_rnd),
        "link_rtt_ms": round(rtt * 1e3, 1),
        "link_probe_bytes": sample_bytes,
    }


def _wall_breakdown(model, planes, cfg, bsz: int, rounds: int = 3):
    """Wall-clock decomposition of ONE batched serving dispatch cycle
    (VERDICT r2 #1): host plane stacking, H2D upload (synced via a dependent
    scalar fetch), and dispatch+compute+result-fetch, per batch and
    per image. The production path overlaps cycles (window>1); this measures
    the serial cost of each stage to show where the wall-clock goes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from facedet_tpu.engine import predict as P

    opts = P._stream_opts(cfg)
    h, w = P._image_hw(planes)
    grid = P.compute_slice_grid(
        h, w, opts["slice_height"], opts["slice_width"],
        opts["overlap_height_ratio"], opts["overlap_width_ratio"],
    )
    t_bucket = P.bucket_tile_count(grid.num_tiles)
    offsets, tile_valid = P.pad_grid_offsets(grid, t_bucket)
    bucket_h = P.bucket_image_dim(grid.padded_h)
    bucket_w = P.bucket_image_dim(grid.padded_w)
    key = P.pipeline_key(
        model, bucket_h, bucket_w, opts["slice_height"], opts["slice_width"],
        opts["perform_standard_pred"], opts["postprocess_type"],
        opts["postprocess_match_metric"], opts["postprocess_match_threshold"],
        opts["postprocess_class_agnostic"], opts["merge_capacity"],
        False, opts["input_format"], fetch_capacity=opts.get("fetch_capacity"),
    )
    fused = P._get_fused_pipeline(model, key)["batch"]
    touch = jax.jit(lambda x: x[:64].astype(jnp.float32).sum())
    offsets_d = jax.device_put(jnp.asarray(offsets))
    valid_d = jax.device_put(jnp.asarray(tile_valid))
    true_hw = jax.device_put(jnp.tile(jnp.asarray([[h, w]], jnp.float32), (bsz, 1)))

    imgs = [planes] * bsz
    fmt = opts["input_format"]
    samples = {"host_stack_s": [], "upload_s": [], "dispatch_fetch_s": []}
    warm = True
    for _ in range(rounds + 1):
        t0 = time.perf_counter()
        # the production single-copy staging path (engine/predict.py) —
        # the breakdown times exactly what serving pays, for any ingest fmt
        staged = P._stage_batch_host(imgs, fmt, bucket_h, bucket_w)
        batch_np = staged if isinstance(staged, tuple) else (staged,)
        t1 = time.perf_counter()
        batch_dev = tuple(jnp.asarray(b) for b in batch_np)
        for b in batch_dev:
            float(touch(b.ravel()))
        t2 = time.perf_counter()
        batch_arg = batch_dev if isinstance(staged, tuple) else batch_dev[0]
        jax.device_get(
            fused(P._resident_variables(model), batch_arg, offsets_d, valid_d, true_hw)
        )
        t3 = time.perf_counter()
        if warm:  # first cycle pays compile; discard
            warm = False
            continue
        samples["host_stack_s"].append(t1 - t0)
        samples["upload_s"].append(t2 - t1)
        samples["dispatch_fetch_s"].append(t3 - t2)

    med = lambda v: sorted(v)[len(v) // 2]
    out = {k: round(med(v), 4) for k, v in samples.items()}
    total = sum(out.values())
    out["serial_cycle_s"] = round(total, 4)
    out["serial_img_per_s"] = round(bsz / total, 2)
    out["batch_size"] = bsz
    out["bytes_uploaded"] = int(sum(b.nbytes for b in batch_np))  # whole batch
    return out


def _device_accounting(model, img, cfg, bsz):
    """Device-only ms/image + XLA-cost FLOPs of the fused batched pipeline,
    measured with all inputs pre-resident on device."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from facedet_tpu.engine import predict as P

    opts = P._stream_opts(cfg)
    h, w = img.shape[:2]
    grid = P.compute_slice_grid(
        h, w, opts["slice_height"], opts["slice_width"],
        opts["overlap_height_ratio"], opts["overlap_width_ratio"],
    )
    t_bucket = P.bucket_tile_count(grid.num_tiles)
    offsets, tile_valid = P.pad_grid_offsets(grid, t_bucket)
    bucket_h = P.bucket_image_dim(grid.padded_h)
    bucket_w = P.bucket_image_dim(grid.padded_w)
    input_format = opts.get("input_format", "rgb")
    key = P.pipeline_key(
        model, bucket_h, bucket_w, opts["slice_height"], opts["slice_width"],
        opts["perform_standard_pred"], opts["postprocess_type"],
        opts["postprocess_match_metric"], opts["postprocess_match_threshold"],
        opts["postprocess_class_agnostic"], opts["merge_capacity"],
        False, input_format, fetch_capacity=opts.get("fetch_capacity"),
    )
    fused = P._get_fused_pipeline(model, key)["batch"]
    if input_format == "dct420":
        from facedet_tpu.ops.jpeg_dct import dct420_bytes

        planes = P._dct_wire(P._pad_dct_planes(img, bucket_h, bucket_w))
        batch_dev = tuple(
            jnp.asarray(np.broadcast_to(p, (bsz,) + p.shape).copy())
            for p in planes
        )
        bytes_h2d = dct420_bytes(bucket_h, bucket_w)
    elif input_format == "dct420s":
        # sparse wire: nominal bytes vary with content, so report the
        # actually-staged bytes per image (one contiguous wire buffer)
        wire = P._stage_batch_host([img] * bsz, input_format, bucket_h, bucket_w)
        batch_dev = jnp.asarray(wire)
        bytes_h2d = wire.nbytes // bsz
    elif input_format == "yuv420":
        y_p, uv_p = P._pad_yuv_planes(img, bucket_h, bucket_w)
        batch_dev = (
            jnp.asarray(np.broadcast_to(y_p, (bsz,) + y_p.shape).copy()),
            jnp.asarray(np.broadcast_to(uv_p, (bsz,) + uv_p.shape).copy()),
        )
        bytes_h2d = bucket_h * bucket_w * 3 // 2  # planar 4:2:0 upload
    else:
        batch = np.zeros((bsz, bucket_h, bucket_w, 3), np.uint8)
        batch[:, :h, :w] = img
        batch_dev = jnp.asarray(batch)
        bytes_h2d = bucket_h * bucket_w * 3  # uint8 RGB canvas upload
    args = (
        P._resident_variables(model),
        jax.device_put(batch_dev),
        jax.device_put(jnp.asarray(offsets)),
        jax.device_put(jnp.asarray(tile_valid)),
        jax.device_put(jnp.tile(jnp.asarray([[h, w]], jnp.float32), (bsz, 1))),
    )
    jax.block_until_ready(args)
    jax.block_until_ready(fused(*args))  # compile + warm

    # Device-only timing over the tunnel: every host dispatch pays a link
    # round-trip, so we loop the WHOLE pipeline n times inside one dispatch
    # (traced trip count -> one compile) and difference n=K vs n=1 to cancel
    # the single RTT. The per-iteration input tweak defeats loop-invariant
    # hoisting.
    @jax.jit
    def repeat_pipeline(n, variables, batch, offsets, tile_valid, true_hw):
        def body(i, acc):
            if isinstance(batch, tuple):  # planar yuv420 / dct420 ingest
                b = (
                    batch[0].at[(0,) * batch[0].ndim].set(
                        (i % 101).astype(batch[0].dtype)
                    ),
                ) + batch[1:]
            else:  # uint8 RGB canvas [n,h,w,3] or 1-D dct420s wire
                b = batch.at[(0,) * batch.ndim].set(
                    (i % 251).astype(batch.dtype)
                )
            det = fused(variables, b, offsets, tile_valid, true_hw)
            return acc + det.scores.sum()

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def timed(n):
        # fetch the scalar: on the tunneled axon platform block_until_ready
        # returns before remote execution finishes — only a host transfer
        # actually synchronizes
        t0 = time.perf_counter()
        float(repeat_pipeline(n, *args))
        return time.perf_counter() - t0

    k = 9
    timed(1)  # compile + warm
    # 7 K-difference rounds; median + spread (VERDICT r2 #6: min-of-3 over a
    # noisy tunnel made any single MFU number a lottery draw)
    diffs = [(timed(k) - timed(1)) / (k - 1) for _ in range(7)]
    positive = sorted(d for d in diffs if d > 0)
    # tunnel RTT noise can exceed the K-1 extra device iterations in a bad
    # link phase, making the difference non-positive — report None over a lie
    if positive:
        device_s_per_image = positive[len(positive) // 2] / bsz
        spread = (positive[0] / bsz, positive[-1] / bsz)
    else:
        device_s_per_image, spread = None, None
    try:
        cost = fused.lower(*args).compile().cost_analysis()
        flops_per_image = float(cost.get("flops", 0.0)) / bsz
    except Exception:
        flops_per_image = 0.0
    return device_s_per_image, spread, flops_per_image, bytes_h2d


def _sr_accounting(image_hw=(512, 768), n_timed: int = 3):
    """SR serving block (VERDICT r3 #2): the enhance-pipeline headline the
    reference scaffolds in scripts/inference_time.py:43-62. Config = the
    reference's production enhancer (x4 RRDBNet-23, tile 400 / pad 10,
    batch-8 tile chunks); throughput runs file->file through
    ``enhance_to_jpeg`` with the sparse device-side coefficient fetch, and
    device ms/MFU come from the same K-difference method as the detector
    block. Trained golden weights are used when committed (recorded in the
    JSON); random init measures the same compute."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from facedet_tpu.engine.enhancer import FaceEnhancer
    from facedet_tpu.utils.viz import save_image

    # the x4 production arm is the GAN-trained checkpoint (like upstream's
    # shipped x4 weights); FaceEnhancer resolves it by catalog name
    from facedet_tpu.engine.enhancer import _golden_ckpt_path

    ckpt = _golden_ckpt_path("RealESRGAN_x4plus")
    weights = os.path.basename(ckpt) if ckpt else "random_init"
    enh = FaceEnhancer(
        model_name="RealESRGAN_x4plus",
        outscale=4.0, tile=400, tile_pad=10, half=True,
    )
    h, w = image_hw
    img = _make_image(h, w)
    tmp = tempfile.mkdtemp(prefix="bench_sr_")
    src = os.path.join(tmp, "in.jpg")
    save_image(src, img, quality=92)

    # throughput: warm (compile) then timed file->file enhancements with the
    # sparse coefficient fetch (the low-bandwidth serving fetch path)
    enh.enhance_to_jpeg(src, os.path.join(tmp, "warm.jpg"), sparse=True)
    t0 = time.perf_counter()
    for i in range(n_timed):
        enh.enhance_to_jpeg(src, os.path.join(tmp, f"out{i}.jpg"), sparse=True)
    sr_ips = n_timed / (time.perf_counter() - t0)

    # device-only K-difference on the fused SR+encode pipeline (inputs
    # resident; per-iteration tweak defeats loop-invariant hoisting)
    pipeline, _qy, _qc, _thw = enh._enhance_dct_pipeline(h, w, 4.0, 95, sparse=True)
    x = jax.device_put(jnp.asarray(img, jnp.float32) / 255.0)
    variables = jax.device_put(enh.variables)

    @jax.jit
    def repeat(n, variables, x):
        def body(i, acc):
            xi = x.at[0, 0, 0].set((i % 7).astype(x.dtype) / 7.0)
            out = pipeline(variables, xi)
            return acc + out[0].astype(jnp.float32).sum()

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def timed(n):
        t0 = time.perf_counter()
        float(repeat(n, variables, x))
        return time.perf_counter() - t0

    k = 3
    timed(1)  # compile + warm
    diffs = [(timed(k) - timed(1)) / (k - 1) for _ in range(3)]
    positive = sorted(d for d in diffs if d > 0)
    dev_s = positive[len(positive) // 2] if positive else None
    try:
        cost = pipeline.lower(enh.variables, x).compile().cost_analysis()
        flops = float(cost.get("flops", 0.0))
    except Exception:
        flops = 0.0
    return {
        "sr_images_per_sec": round(sr_ips, 3),
        "sr_device_ms_per_image": round(dev_s * 1e3, 1) if dev_s else None,
        "sr_mfu_est": (
            round(flops / (dev_s * PEAK_BF16_FLOPS), 4) if flops and dev_s else None
        ),
        "sr_flops_per_image": flops,
        "sr_scale": 4, "sr_tile": 400, "sr_tile_pad": 10,
        "sr_input_hw": list(image_hw), "sr_weights": weights,
        # wide = int16 sparse AC values: GAN-sharpened output overflows the
        # int8 wire and used to silently hit the pixel-fetch fallback every
        # image (probe_sr_e2e, BENCH.md round-5 SR serving study)
        "sr_fetch": "dct420s-wide",
    }


def _v2_accounting(model, image_hw=(512, 768), n_timed: int = 4):
    """Pipeline-v2 serving block (VERDICT r4 #6): whole-image x2 SR ->
    device-resident hand-off -> SAHI on the enhanced canvas -> boxes / scale
    (reference pipeline_v2_enhancement_first/app_v2.py:19-45,131-154, with
    the reference's fixed-grid slice policy). Measured end-to-end through
    ``enhance_first_pipeline`` on the same natural-statistics image as the
    SR block; x2 of 512x768 lands on the detection bench's 1024x1536
    canvas."""
    from facedet_tpu.engine.enhancer import FaceEnhancer, _golden_ckpt_path
    from facedet_tpu.engine.pipelines import enhance_first_pipeline

    ckpt = _golden_ckpt_path("RealESRGAN_x2plus")
    enh = FaceEnhancer(
        model_name="RealESRGAN_x2plus",
        outscale=2.0, tile=400, tile_pad=10, half=True,
    )
    img = _make_image(*image_hw)
    enhance_first_pipeline(img, model, enh)  # compile + warm
    lat = []
    res = None
    for _ in range(n_timed):
        t0 = time.perf_counter()
        res = enhance_first_pipeline(img, model, enh)
        lat.append(time.perf_counter() - t0)
    lat.sort()
    p50 = lat[len(lat) // 2]
    return {
        "v2_images_per_sec": round(1.0 / p50, 3),
        "v2_p50_latency_s": round(p50, 4),
        "v2_enhance_s": round(
            res.durations_in_seconds.get("enhance", 0.0), 4
        ),
        "v2_scale": 2, "v2_input_hw": list(image_hw),
        "v2_slice_policy": "fixed_grid",
        "v2_weights": os.path.basename(ckpt) if ckpt else "random_init",
    }


def run_bench(num_images: int, image_hw=(1024, 1536), warmup: int = 2, bsz: int = 64,
              ingest: str = "dct420s", int8: bool = False):
    """bsz=64: the measured serving sweet spot on the tunneled v5e — dispatch
    and link round-trip overheads amortise over the batch (8->16->32->64
    images/dispatch measured 5.5 -> 8.4 -> 9.7 -> 11.1 img/s in one medium
    link phase; device accounting uses a smaller batch to bound compile)."""
    from facedet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from facedet_tpu.engine.detector import YoloV11PoseDetectionModel
    from facedet_tpu.engine.predict import (
        get_sliced_prediction,
        predict_stream_batched,
    )

    model = YoloV11PoseDetectionModel(
        scale="s",
        dtype="bfloat16",
        confidence_threshold=0.25,
        image_size=640,
        max_detections_per_tile=300,
    )
    if int8:
        # MXU-int8 serving mode (models/quantize.py): backbone+neck convs in
        # int8 with folded BN epilogues; golden-parity A/B'd in
        # tools/probe_int8_yolo
        from facedet_tpu.models.quantize import quantize_detector

        n_q = quantize_detector(model)
        _PROGRESS["extras"]["int8_convs"] = n_q
    img = _make_image(*image_hw)

    cfg = dict(
        slice_height=640,
        slice_width=640,
        overlap_height_ratio=0.2,
        overlap_width_ratio=0.2,
        perform_standard_pred=True,
        postprocess_type="GREEDYNMM",
        postprocess_match_metric="IOS",
        postprocess_match_threshold=0.5,
        postprocess_class_agnostic=True,
        # entropy-domain ingest (ops/jpeg_dct.py): quantized DCT coefficients
        # (the representation JPEG files store); dequant + IDCT run as MXU
        # matmuls fused into the pipeline. The dct420s default ships the AC
        # planes as a sparse bitmap + packed values — ~3-4x fewer nominal
        # wire bytes than the dense planes (BENCH.md round-3 sparse wire).
        input_format=ingest,
        # serving compaction: fetch only the top-300 merged rows per image
        # (the reference's ultralytics predictor caps at max_det=300 the same
        # way) — 1024-row fetches cost ~3.4x the D2H bytes for padding
        fetch_capacity=300,
    )

    # pre-encoded coefficient planes stand in for JPEG-direct coefficient
    # ingest (libjpeg's jpeg_read_coefficients emits them without any IDCT) —
    # same standard as the previous RGB/YUV benches, which also excluded
    # JPEG decode from the measured stream
    from facedet_tpu.ops.color import rgb_to_yuv420
    from facedet_tpu.ops.jpeg_dct import encode_dct420

    fmt = cfg.get("input_format", "rgb")
    if fmt in ("dct420", "dct420s"):
        planes = encode_dct420(img, quality=90)
    elif fmt == "yuv420":
        planes = rgb_to_yuv420(img)
    else:
        planes = img

    # latency: synchronous per-image path; best-of-3 rounds because the
    # tunneled TPU link's health oscillates on a minutes timescale (see
    # CLAUDE.md) — we are measuring the framework, not the transient link
    for _ in range(warmup):
        get_sliced_prediction(planes, model, **cfg)
    p50 = float("inf")
    for _ in range(3):
        lat = []
        for _ in range(max(4, num_images // 4)):
            t0 = time.perf_counter()
            get_sliced_prediction(planes, model, **cfg)
            lat.append(time.perf_counter() - t0)
        p50 = min(p50, sorted(lat)[len(lat) // 2])
        _PROGRESS["p50"] = p50

    # throughput FIRST: windowed batched stream (bsz images/dispatch,
    # raw detections, window=3 batches in flight) — the serving configuration;
    # uploads of the next batch overlap compute/fetch of the current one. At
    # least 5 batches per run: a 2-batch stream is all ramp (first batch has
    # nothing to overlap with), under-reporting the pipelined steady state.
    # The headline number is recorded BEFORE the accounting extras so a
    # watchdog firing during the (several-minute) extras still emits a real
    # throughput sample instead of the p50 lower bound.
    n = max(num_images, 5 * bsz)
    for _ in predict_stream_batched([planes] * (2 * bsz), model, batch_size=bsz,
                                    window=3, raw=True, **cfg):
        pass  # compile + warm
    ips = 0.0
    for _ in range(3):
        t_start = time.perf_counter()
        done = 0
        for _batch in predict_stream_batched(
            [planes] * n, model, batch_size=bsz, window=3, raw=True, **cfg
        ):
            # count actual images: the final batch can be partial when n is
            # not a multiple of bsz (raw Detections lead with the batch dim)
            done += int(_batch.scores.shape[0])
        ips = max(ips, done / (time.perf_counter() - t_start))
        _PROGRESS["ips"] = ips

    # device-only compute + FLOPs accounting (no host link in the timing)
    dev_s, dev_spread, flops, bytes_h2d = _device_accounting(model, img, cfg, min(bsz, 8))
    _PROGRESS["extras"] = {
        "device_ms_per_image": round(dev_s * 1e3, 3) if dev_s else None,
        "device_ms_spread": (
            [round(s * 1e3, 3) for s in dev_spread] if dev_spread else None
        ),
        "flops_per_image": flops,
        "mfu_est": (
            round(flops / (dev_s * PEAK_BF16_FLOPS), 4) if flops and dev_s else None
        ),
        "bytes_h2d_per_image": bytes_h2d,
        "input_format": cfg.get("input_format", "rgb"),
    }

    # raw link probe + serial wall-clock decomposition of one serving cycle
    try:
        _PROGRESS["extras"].update(_link_probe())
    except Exception:
        pass
    try:
        _PROGRESS["extras"]["wall_breakdown"] = _wall_breakdown(
            model, planes, cfg, bsz
        )
    except Exception:
        pass

    # SR serving block (x4 enhance pipeline headline, VERDICT r3 #2)
    try:
        _PROGRESS["extras"].update(_sr_accounting())
    except Exception as e:
        _PROGRESS["extras"]["sr_error"] = f"{type(e).__name__}: {str(e)[:120]}"

    # pipeline-v2 serving block (enhance-first composition, VERDICT r4 #6)
    try:
        _PROGRESS["extras"].update(_v2_accounting(model))
    except Exception as e:
        _PROGRESS["extras"]["v2_error"] = f"{type(e).__name__}: {str(e)[:120]}"

    return ips, p50, _PROGRESS["extras"]


def _emit(ips, p50, extras=None, complete=True):
    source = "batched_stream"
    if not ips and p50 and p50 != float("inf"):
        # watchdog fired before the batched-stream phase produced a number
        # (cold compile + stalled link): the synchronous per-image latency is
        # a true lower bound on throughput — report that over a 0.0 lie
        ips = 1.0 / p50
        source = "p50_lower_bound"
    out = {
        "metric": "widerface_sahi640_images_per_sec",
        "value": round(ips, 4),
        "unit": "images/sec",
        "vs_baseline": round(ips / CPU_REFERENCE_IPS, 2),
        "baseline_kind": BASELINE_KIND,
        "p50_latency_s": round(p50, 4) if p50 is not None and p50 != float("inf") else None,
        "throughput_source": source,
    }
    out.update(extras or {})
    if not complete:
        out["incomplete"] = True  # watchdog fired mid-run (TPU link stall)
    print(json.dumps(out), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=16)
    ap.add_argument("--cpu", action="store_true", help="measure the CPU baseline")
    ap.add_argument("--watchdog", type=int, default=900, help="seconds before emitting best-so-far and exiting (0 = off; default sized for the accounting extras + SR block on a warm compile cache)")
    ap.add_argument(
        "--ingest", default="dct420s",
        choices=["rgb", "yuv420", "dct420", "dct420s"],
        help="upload format for the measured stream (default: sparse-bitmap "
        "DCT coefficients — fewest wire bytes through the tunneled link)",
    )
    ap.add_argument("--int8", action="store_true",
                    help="quantize the detector's backbone+neck convs to "
                         "MXU int8 (models/quantize.py)")
    args = ap.parse_args()

    if args.watchdog and not args.cpu:
        def _bail():
            time.sleep(args.watchdog)
            if not _PROGRESS["complete"]:
                _emit(_PROGRESS["ips"], _PROGRESS["p50"], _PROGRESS["extras"], complete=False)
                os._exit(0)

        threading.Thread(target=_bail, daemon=True).start()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["JAX_PLATFORM_NAME"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    # the CPU baseline keeps its CPU-optimal ingest (see CPU_REFERENCE_IPS
    # note above); --ingest only steers the TPU measurement
    ingest = "yuv420" if args.cpu else args.ingest
    ips, p50, extras = run_bench(args.images, ingest=ingest,
                                 int8=args.int8 and not args.cpu)
    _PROGRESS["complete"] = True
    _emit(ips, p50, extras)


if __name__ == "__main__":
    main()
