"""Stage-level device-time bisect of the fused sliced pipeline.

The K-difference method (bench.py `_device_accounting`) gives ONE number for
the whole fused dispatch; this tool re-runs it on *truncated* variants of the
same pipeline — each stage's scalar-reduced prefix — so the per-stage device
cost is the difference between consecutive rows. CLAUDE.md "Performance
rules": this is the sanctioned way to find device-side costs the K-difference
cannot attribute (scalarized ops, sort/top-k, NMS fixpoint rounds).

Run on the real TPU:  python -m facedet_tpu.tools.profile_stages
Stages mirror engine/predict.py::_get_fused_pipeline batch_core exactly —
the chunked flat-forward structure (lax.map over image chunks, detector over
the flattened [C*T] tile batch, bf16 canvas for bf16 models). If batch_core
changes, update the STAGES here.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def build_stage_fn(model, key, stage: str, n_imgs: int):
    """Truncated copy of predict._get_fused_pipeline batch_core, scalar-reduced.

    Returns f(variables, wire, offsets, tile_valid, true_hw) -> scalar.
    """
    from facedet_tpu.models.yolo_decode import (
        decode_predictions,
        decode_to_detections,
    )
    from facedet_tpu.ops.color import yuv420_to_rgb_f32
    from facedet_tpu.ops.jpeg_dct import (
        decode_dct420_to_yuv_f32,
        unpack_sparse_ac,
        wire_unpack_dct420s,
    )
    from facedet_tpu.ops.nms import merge_detections
    from facedet_tpu.ops.tiler import gather_tiles
    from facedet_tpu.core.detections import Detections
    from facedet_tpu.engine.predict import (
        _clip_detections,
        _shift_and_flatten,
        _truncate_by_score,
    )

    (
        bucket_h, bucket_w, slice_h, slice_w, standard, conf, mode, metric,
        threshold, agnostic, capacity, img_size, _use_pallas, input_format,
        fetch_capacity, _forward_variant,
    ) = key
    assert input_format == "dct420s"
    canvas_dtype = (
        jnp.bfloat16 if str(getattr(model, "dtype", "")) == "bfloat16"
        else jnp.float32
    )

    def tree_sum(t):
        return sum(
            jnp.sum(x.astype(jnp.float32))
            for x in jax.tree.leaves(t)
            if x is not None
        )

    def decode_canvas(image):
        y_dc, uv_dc, qy, qc, deltas, vals = image
        yb_h, yb_w = bucket_h // 8, bucket_w // 8
        cb_h, cb_w = bucket_h // 16, bucket_w // 16
        ny = 64 * yb_h * yb_w
        nc = 2 * 64 * cb_h * cb_w
        flat = unpack_sparse_ac(deltas, vals, ny + nc)
        if stage == "unpack":
            return None, tree_sum(flat)
        y_ac = jnp.moveaxis(flat[:ny].reshape(64, yb_h, yb_w), 0, -1)
        uv_ac = jnp.transpose(flat[ny:].reshape(2, 64, cb_h, cb_w), (2, 3, 0, 1))
        y, uv = decode_dct420_to_yuv_f32(
            y_dc, y_ac, uv_dc, uv_ac, qy, qc, out_dtype=canvas_dtype
        )
        if stage == "idct":
            return None, tree_sum((y, uv))
        imgf = yuv420_to_rgb_f32(y, uv, out_dtype=canvas_dtype)
        if stage == "rgb":
            return None, tree_sum(imgf)
        return imgf, None

    def forward_tiles(variables, tiles):
        # mirror tile_forward's s2d gate so "convs" measures the serving path
        if getattr(model, "s2d_early", False):
            from facedet_tpu.models.yolo_s2d import s2d_early_forward

            early = s2d_early_forward(variables, tiles, model.cfg)
            return model.model.apply(variables, early, train=False, from_early=True)
        return model.model.apply(variables, tiles, train=False)

    def batch_fn(variables, wire, offsets, tile_valid, true_hw):
        image = wire_unpack_dct420s(wire, n_imgs, bucket_h, bucket_w)
        b = true_hw.shape[0]
        t = offsets.shape[0]
        c = max(d for d in range(1, b + 1) if b % d == 0 and (d == 1 or d * t <= 96))

        def chunk_fn(args):
            img_c, hw_c = args
            padded, early = jax.vmap(decode_canvas)(img_c)
            if early is not None:
                return early.sum()
            tiles = jax.vmap(
                lambda p: gather_tiles(p, offsets, slice_h, slice_w)
            )(padded)
            if stage == "tiles":
                return tree_sum(tiles)
            flat_tiles = tiles.reshape((c * t,) + tiles.shape[2:])
            outs = forward_tiles(variables, flat_tiles)
            if stage == "convs":
                return tree_sum(outs)
            preds = decode_predictions(outs)
            if stage == "head_decode":
                return tree_sum(preds)
            det = decode_to_detections(
                preds, conf_threshold=conf,
                max_detections=model.max_detections_per_tile,
                nms_iou=0.7, class_agnostic=True,
                with_nms=(stage not in ("topk",)),
            )
            if stage in ("topk", "tile_nms"):
                return tree_sum(det)
            det = jax.tree.map(lambda x: x.reshape((c, t) + x.shape[1:]), det)

            full_det = None
            if standard:
                def letterbox_full(padded_i, hw):
                    scale = jnp.minimum(img_size / hw[0], img_size / hw[1])
                    full_tile = jax.image.scale_and_translate(
                        padded_i, (img_size, img_size, padded_i.shape[2]), (0, 1),
                        jnp.stack([scale, scale]), jnp.zeros(2), method="linear",
                    )
                    return full_tile, scale

                full_tiles, scales = jax.vmap(letterbox_full)(padded, hw_c)
                full_det = model.tile_forward(variables, full_tiles, conf)

                def rescale(fd, s):
                    kpts = fd.kpts.at[..., :2].divide(s)
                    return Detections(
                        boxes=fd.boxes / s, scores=fd.scores,
                        classes=fd.classes, kpts=kpts, valid=fd.valid,
                    )

                full_det = jax.vmap(rescale)(full_det, scales)

            def tail(d, f, hw):
                flat_d = _shift_and_flatten(d, offsets, tile_valid)
                parts = [flat_d] if f is None else [flat_d, f]
                combined = jax.tree.map(
                    lambda *xs: jnp.concatenate(xs, axis=0), *parts
                )
                if stage == "standard":
                    return tree_sum(combined)
                combined = _truncate_by_score(combined, capacity)
                if stage == "truncate":
                    return tree_sum(combined)
                merged = merge_detections(
                    combined, mode=mode, match_metric=metric,
                    match_threshold=threshold, class_agnostic=agnostic,
                )
                clipped = _clip_detections(merged, hw[0], hw[1])
                if fetch_capacity and fetch_capacity < capacity:
                    clipped = _truncate_by_score(clipped, fetch_capacity)
                return tree_sum(clipped)

            if full_det is None:
                return jax.vmap(lambda d, hw: tail(d, None, hw))(det, hw_c).sum()
            return jax.vmap(tail)(det, full_det, hw_c).sum()

        img_r = jax.tree.map(lambda x: x.reshape((b // c, c) + x.shape[1:]), image)
        out = jax.lax.map(chunk_fn, (img_r, true_hw.reshape(b // c, c, 2)))
        return out.sum()

    return batch_fn


STAGES = [
    "unpack", "idct", "rgb", "tiles", "convs", "head_decode",
    "topk", "tile_nms", "standard", "truncate", "full",
]


def main(bsz: int = 8, k: int = 9, rounds: int = 5):
    from facedet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from bench import _make_image

    from facedet_tpu.engine import predict as P
    from facedet_tpu.engine.detector import YoloV11PoseDetectionModel
    from facedet_tpu.ops.jpeg_dct import encode_dct420

    model = YoloV11PoseDetectionModel(
        scale="s", dtype="bfloat16", confidence_threshold=0.25,
        image_size=640, max_detections_per_tile=300,
    )
    img = _make_image(1024, 1536)
    planes = encode_dct420(img, quality=90)
    h, w = 1024, 1536
    grid = P.compute_slice_grid(h, w, 640, 640, 0.2, 0.2)
    t_bucket = P.bucket_tile_count(grid.num_tiles)
    offsets, tile_valid = P.pad_grid_offsets(grid, t_bucket)
    bucket_h = P.bucket_image_dim(grid.padded_h)
    bucket_w = P.bucket_image_dim(grid.padded_w)
    key = P.pipeline_key(
        model, bucket_h, bucket_w, 640, 640, True, "GREEDYNMM", "IOS",
        0.5, True, 1024, False, "dct420s",
    )

    wire = P._stage_batch_host([planes] * bsz, "dct420s", bucket_h, bucket_w)
    wire_dev = jax.device_put(jnp.asarray(wire))
    variables = P._resident_variables(model)
    offs = jax.device_put(jnp.asarray(offsets))
    tv = jax.device_put(jnp.asarray(tile_valid))
    true_hw = jax.device_put(jnp.tile(jnp.asarray([[h, w]], jnp.float32), (bsz, 1)))
    jax.block_until_ready(wire_dev)

    results = {}
    for stage in STAGES:
        batched = jax.jit(build_stage_fn(model, key, stage, bsz))

        @jax.jit
        def repeat(n, variables, wire, offs, tv, true_hw, batched=batched):
            def body(i, acc):
                w_ = wire.at[0].set((i % 101).astype(wire.dtype))
                return acc + batched(variables, w_, offs, tv, true_hw)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        def timed(n):
            t0 = time.perf_counter()
            float(repeat(n, variables, wire_dev, offs, tv, true_hw))
            return time.perf_counter() - t0

        t0 = time.perf_counter()
        timed(1)  # compile + warm
        compile_s = time.perf_counter() - t0
        diffs = sorted(
            d for d in ((timed(k) - timed(1)) / (k - 1) for _ in range(rounds))
            if d > 0
        )
        per_img_ms = (diffs[len(diffs) // 2] / bsz * 1e3) if diffs else float("nan")
        results[stage] = per_img_ms
        print(
            f"{stage:12s} cum {per_img_ms:8.3f} ms/img   "
            f"(compile {compile_s:.1f}s, {len(diffs)}/{rounds} positive)",
            flush=True,
        )

    print("\n-- marginal cost per stage (diff of consecutive cumulative rows)")
    prev = 0.0
    for stage in STAGES:
        cur = results[stage]
        print(f"{stage:12s} {cur - prev:8.3f} ms/img")
        prev = cur


if __name__ == "__main__":
    main()
