"""Sliced and standard prediction drivers — the public inference API.

Reference: docs sahi/predict.py (get_prediction :63, get_sliced_prediction
:142, predict :385). The reference loops slices one at a time through the
detector ("currently only 1 batch supported", :225-288) and merges per-box
Python objects on CPU. Here the whole pipeline — tile gather, detector forward
over the full tile batch, slice→global shift, GreedyNMM/NMS merge — runs on
device in a handful of XLA dispatches with static shapes; tile counts are
bucketed to bound recompilation across variable-resolution image streams.
"""
from __future__ import annotations

import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from facedet_tpu.core.detections import Detections
from facedet_tpu.engine.detector import DetectionModel
from facedet_tpu.engine.prediction import (
    PredictionResult,
    detections_to_object_predictions,
)
from facedet_tpu.ops.nms import merge_detections
from facedet_tpu.ops.tiler import (
    adaptive_slice_size,
    bucket_image_dim,
    bucket_tile_count,
    compute_slice_grid,
    gather_tiles,
    pad_grid_offsets,
)

__all__ = [
    "get_prediction",
    "get_sliced_prediction",
    "get_sliced_prediction_batch",
    "predict_stream",
    "predict_stream_batched",
    "POSTPROCESS_DEFAULTS",
]

POSTPROCESS_DEFAULTS = {
    "postprocess_type": "GREEDYNMM",
    "postprocess_match_metric": "IOS",
    "postprocess_match_threshold": 0.5,
    "postprocess_class_agnostic": False,
}


@jax.jit
def _shift_and_flatten(det: Detections, offsets: jax.Array, tile_valid: jax.Array) -> Detections:
    """Per-tile detections [T, k] -> flat global-coordinate detections [T*k]."""
    off_xy = jnp.flip(offsets.astype(jnp.float32), axis=-1)  # (y,x) -> (x,y)
    box_off = jnp.tile(off_xy, (1, 2))[:, None, :]  # [T,1,4]
    boxes = det.boxes + box_off
    kpts = det.kpts.at[..., 0].add(off_xy[:, None, None, 0])
    kpts = kpts.at[..., 1].add(off_xy[:, None, None, 1])
    valid = det.valid & tile_valid[:, None]
    t, k = valid.shape
    return Detections(
        boxes=boxes.reshape(t * k, 4),
        scores=det.scores.reshape(t * k),
        classes=det.classes.reshape(t * k),
        kpts=kpts.reshape(t * k, det.kpts.shape[-2], 3),
        valid=valid.reshape(t * k),
    )


@functools.partial(jax.jit, static_argnames=("capacity",))
def _truncate_by_score(det: Detections, capacity: int) -> Detections:
    det = det.sort_by_score()
    return jax.tree.map(lambda x: x[:capacity], det)


@functools.partial(jax.jit, static_argnames=())
def _clip_detections(det: Detections, h: jax.Array, w: jax.Array) -> Detections:
    from facedet_tpu.core.boxes import clip_boxes

    boxes = clip_boxes(det.boxes, h, w)
    # drop boxes that clipping degenerated to zero area (fully outside image)
    nonzero = (boxes[..., 2] > boxes[..., 0]) & (boxes[..., 3] > boxes[..., 1])
    return Detections(
        boxes=boxes,
        scores=det.scores,
        classes=det.classes,
        kpts=det.kpts,
        valid=det.valid & nonzero,
    )


def pipeline_key(
    detection_model,
    bucket_h: int,
    bucket_w: int,
    slice_height: int,
    slice_width: int,
    perform_standard_pred,
    postprocess_type: str,
    postprocess_match_metric: str,
    postprocess_match_threshold,
    postprocess_class_agnostic,
    merge_capacity,
    use_pallas_gather: bool = False,
    input_format: str = "rgb",
    *,
    fetch_capacity: Optional[int] = None,
) -> tuple:
    """THE fused-pipeline cache key. Single constructor for every call site
    (engine dispatch paths, bench device accounting) — the 15-tuple is
    destructured positionally by _get_fused_pipeline, so ad-hoc rebuilds
    would silently transpose config fields when the key evolves.

    ``fetch_capacity`` (keyword-only): compact the merged output to the top-k
    rows by (valid, score) before it leaves the device — the fetched pytree
    shrinks from ``merge_capacity`` to ``fetch_capacity`` rows (~3.4x fewer
    D2H bytes at the 1024 -> 300 default serving config; the reference's
    ultralytics predictor caps per-image output at max_det=300 the same way,
    utils/yolo_wrapper.py:74-82). None fetches the full merge capacity."""
    img_size = int(detection_model.image_size or max(slice_height, slice_width))
    return (
        bucket_h,
        bucket_w,
        slice_height,
        slice_width,
        bool(perform_standard_pred),
        float(detection_model.confidence_threshold),
        postprocess_type.upper(),
        postprocess_match_metric.upper(),
        float(postprocess_match_threshold),
        bool(postprocess_class_agnostic),
        int(merge_capacity),
        img_size,
        bool(use_pallas_gather),
        str(input_format),
        int(fetch_capacity) if fetch_capacity else 0,
        # anything else that changes the traced forward (e.g. the YOLO s2d
        # fast-path toggle) — see DetectionModel._forward_variant
        detection_model._forward_variant(),
    )


def _get_fused_pipeline(
    detection_model: DetectionModel,
    key: tuple,
    mesh=None,
):
    """Build (and cache on the model) ONE jitted function running the whole
    sliced pipeline on device: normalize -> pad -> tile gather -> detector
    forward over the tile batch (+ full-image letterboxed standard pass) ->
    slice-to-global shift -> truncate -> GreedyNMM/NMS merge -> clip.

    A single dispatch per image: the reference instead round-trips the host
    between every stage (docs sahi/predict.py:270-320), which over a remote
    TPU link costs ~100x the device compute."""
    cache = detection_model.__dict__.setdefault("_fused_cache", {})
    cache_key = key + ((id(mesh),) if mesh is not None else ())
    if cache_key in cache:
        return cache[cache_key]
    (
        bucket_h,
        bucket_w,
        slice_h,
        slice_w,
        standard,
        conf,
        mode,
        metric,
        threshold,
        agnostic,
        capacity,
        img_size,
        use_pallas,
        input_format,
        fetch_capacity,
        _forward_variant,  # cache discriminator only; tile_forward reads the model
    ) = key
    # the decoded canvas is stored in the detector's compute dtype: for bf16
    # serving this halves the HBM bytes moved by the IDCT block relayout, the
    # chroma upsample/RGB convert, the tile gather, and the standard-pass
    # letterbox (pixels live in [0,255]/[0,1] where bf16 rounding is <= the
    # +-0.5 LSB a uint8 decode applies anyway); fidelity paths keep f32 by
    # constructing the model with dtype="float32"
    canvas_dtype = (
        jnp.bfloat16
        if str(getattr(detection_model, "dtype", "")) == "bfloat16"
        else jnp.float32
    )

    def decode_canvas(image):
        if input_format == "yuv420":
            # low-bandwidth ingest: planar (Y, UV) uint8 at 1.5 bytes/pixel;
            # chroma upsample + BT.601 conversion run on device and fuse into
            # the pipeline (ops/color.py) — halves the dominant H2D cost
            from facedet_tpu.ops.color import yuv420_to_rgb_f32

            y, uv = image
            imgf = yuv420_to_rgb_f32(y, uv, out_dtype=canvas_dtype)
        elif input_format == "dct420":
            # entropy-domain ingest (ops/jpeg_dct.py): quantized DCT
            # coefficients upload ~2x faster through the compressing link
            # (97% zeros); dequant + 8x8 IDCT run as MXU matmuls and fuse
            # into the pipeline like the YUV path they feed. AC planes
            # arrive coefficient-major ("wire layout", _dct_wire): same-
            # frequency statistics group into long zero runs the link
            # compressor crushes ~1.9x better; transposed back here (a
            # cheap int8 relayout next to the IDCT matmuls).
            from facedet_tpu.ops.color import yuv420_to_rgb_f32
            from facedet_tpu.ops.jpeg_dct import decode_dct420_to_yuv_f32

            y_dc, y_ac, uv_dc, uv_ac, qy, qc = image
            y_ac = jnp.moveaxis(y_ac, 0, -1)
            uv_ac = jnp.transpose(uv_ac, (2, 3, 0, 1))
            y, uv = decode_dct420_to_yuv_f32(
                y_dc, y_ac, uv_dc, uv_ac, qy, qc, out_dtype=canvas_dtype
            )
            imgf = yuv420_to_rgb_f32(y, uv, out_dtype=canvas_dtype)
        elif input_format == "dct420s":
            # sparse AC wire (ops/jpeg_dct.py): the dense AC planes are
            # mostly zeros the link compressor only partly recovers;
            # shipping (position deltas, nonzero values) cuts upload time
            # ~3.4x (BENCH.md round-3 sparse-wire A/B). Reconstruction is
            # a cap-sized cumsum + scatter here, next to the IDCT matmuls
            # it feeds (~0.06 s per 64-image batch; the bitmap variant's
            # n-sized rank gather cost 1.9 s — scalarized on TPU).
            from facedet_tpu.ops.color import yuv420_to_rgb_f32
            from facedet_tpu.ops.jpeg_dct import (
                decode_dct420_to_yuv_f32,
                unpack_sparse_ac,
            )

            y_dc, uv_dc, qy, qc, deltas, vals = image
            yb_h, yb_w = bucket_h // 8, bucket_w // 8
            cb_h, cb_w = bucket_h // 16, bucket_w // 16
            ny = 64 * yb_h * yb_w
            nc = 2 * 64 * cb_h * cb_w
            flat = unpack_sparse_ac(deltas, vals, ny + nc)
            y_ac = jnp.moveaxis(flat[:ny].reshape(64, yb_h, yb_w), 0, -1)
            uv_ac = jnp.transpose(
                flat[ny:].reshape(2, 64, cb_h, cb_w), (2, 3, 0, 1)
            )
            y, uv = decode_dct420_to_yuv_f32(
                y_dc, y_ac, uv_dc, uv_ac, qy, qc, out_dtype=canvas_dtype
            )
            imgf = yuv420_to_rgb_f32(y, uv, out_dtype=canvas_dtype)
        else:
            imgf = (
                image.astype(canvas_dtype) / 255.0
                if image.dtype == jnp.uint8
                else image.astype(canvas_dtype)
            )
        return imgf  # already padded to (bucket_h, bucket_w) on host

    def letterbox_full(padded, true_hw):
        # dynamic letterbox: traced per-image scale, static 640/1024-canvas
        # output — the true-size letterbox semantics of the reference's
        # full-image pass without a compile per unique resolution
        scale = jnp.minimum(img_size / true_hw[0], img_size / true_hw[1])
        full_tile = jax.image.scale_and_translate(
            padded,
            (img_size, img_size, padded.shape[2]),
            (0, 1),
            jnp.stack([scale, scale]),
            jnp.zeros(2),
            method="linear",
        )
        return full_tile, scale

    def rescale_full_det(full_det, scale):
        kpts = full_det.kpts.at[..., :2].divide(scale)
        return Detections(
            boxes=full_det.boxes / scale,
            scores=full_det.scores,
            classes=full_det.classes,
            kpts=kpts,
            valid=full_det.valid,
        )

    def tail(det, full_det, offsets, tile_valid, true_hw):
        flat = _shift_and_flatten(det, offsets, tile_valid)
        parts = [flat] if full_det is None else [flat, full_det]
        combined = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *parts)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            combined = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, PartitionSpec())
                ),
                combined,
            )
        combined = _truncate_by_score(combined, capacity)
        merged = merge_detections(
            combined,
            mode=mode,
            match_metric=metric,
            match_threshold=threshold,
            class_agnostic=agnostic,
        )
        clipped = _clip_detections(merged, true_hw[0], true_hw[1])
        if fetch_capacity and fetch_capacity < capacity:
            # serving compaction: ship only the top rows off device (the sort
            # is a 1k-element argsort — noise next to the D2H bytes it saves)
            clipped = _truncate_by_score(clipped, fetch_capacity)
        return clipped

    def core(variables, image, offsets, tile_valid, true_hw):
        padded = decode_canvas(image)
        tiles = gather_tiles(padded, offsets, slice_h, slice_w, use_pallas=use_pallas)
        if mesh is not None:
            # spatial/"context" parallelism (SURVEY.md §2.4): shard THIS
            # image's tile batch over the mesh's tile axis; GSPMD partitions
            # the detector forward across chips and all-gathers the per-tile
            # detections before the (replicated) global merge over ICI
            from jax.sharding import NamedSharding, PartitionSpec

            tiles = jax.lax.with_sharding_constraint(
                tiles, NamedSharding(mesh, PartitionSpec("tile", None, None, None))
            )
        det = detection_model.tile_forward(variables, tiles, conf)
        full_det = None
        if standard:
            full_tile, scale = letterbox_full(padded, true_hw)
            full_det = detection_model.tile_forward(variables, full_tile[None], conf)
            full_det = jax.tree.map(lambda x: x[0], full_det)
            full_det = rescale_full_det(full_det, scale)
        return tail(det, full_det, offsets, tile_valid, true_hw)

    def batch_core(variables, image, offsets, tile_valid, true_hw):
        """Chunked flat-forward batched variant. Ingest and merge are vmapped
        per image, but the detector runs over FLATTENED [C*T] tile batches
        (and [C] letterboxed standard batches): vmap-nesting the whole
        per-image pipeline costs ~0.36 ms/image extra in the backbone alone
        (measured, BENCH.md round-3 layer profile). Chunking via lax.map
        bounds the materialized tile buffer — a single [B*T,640,640,3] bf16
        conv input at B=64 is a 9-20 GB allocation (padded layout) and OOMs
        the 16 GB chip."""
        if input_format == "dct420s" and not isinstance(image, tuple):
            # single-buffer wire from _stage_batch_host: bitcast-unpack the
            # six staged arrays on device (shapes static at trace time)
            from facedet_tpu.ops.jpeg_dct import wire_unpack_dct420s

            image = wire_unpack_dct420s(
                image, true_hw.shape[0], bucket_h, bucket_w
            )
        b = true_hw.shape[0]
        t = offsets.shape[0]
        # largest divisor of b keeping the flat tile batch <= 96 (2.4 GB bf16)
        c = max(d for d in range(1, b + 1) if b % d == 0 and (d == 1 or d * t <= 96))

        def chunk_fn(args):
            img_c, hw_c = args
            padded = jax.vmap(decode_canvas)(img_c)
            tiles = jax.vmap(
                lambda p: gather_tiles(
                    p, offsets, slice_h, slice_w, use_pallas=use_pallas
                )
            )(padded)
            det = detection_model.tile_forward(
                variables, tiles.reshape((c * t,) + tiles.shape[2:]), conf
            )
            det = jax.tree.map(lambda x: x.reshape((c, t) + x.shape[1:]), det)
            full_det = None
            if standard:
                full_tiles, scales = jax.vmap(letterbox_full)(padded, hw_c)
                full_det = detection_model.tile_forward(variables, full_tiles, conf)
                full_det = jax.vmap(rescale_full_det)(full_det, scales)
            if full_det is None:
                return jax.vmap(
                    lambda d, hw: tail(d, None, offsets, tile_valid, hw)
                )(det, hw_c)
            return jax.vmap(
                lambda d, f, hw: tail(d, f, offsets, tile_valid, hw)
            )(det, full_det, hw_c)

        img_r = jax.tree.map(
            lambda x: x.reshape((b // c, c) + x.shape[1:]), image
        )
        out = jax.lax.map(chunk_fn, (img_r, true_hw.reshape(b // c, c, 2)))
        return jax.tree.map(lambda x: x.reshape((b,) + x.shape[2:]), out)

    entry = {
        "single": jax.jit(core),
        # batched-stream variant: amortises per-dispatch/link overhead over a
        # whole same-size image batch (weights and tile grid broadcast)
        "batch": jax.jit(batch_core),
    }
    cache[cache_key] = entry
    return entry


def _resident_variables(detection_model, device=None):
    """Weights committed to the dispatch device, cached per device.

    Every load_model initializes under ``jax.default_device(cpu)`` (remote
    init costs minutes, CLAUDE.md), which COMMITS the params to the CPU
    device — and a jit executing on the accelerator then re-transfers the
    whole tree on EVERY dispatch (measured 1.06 s/dispatch for the 39 MB
    453-leaf yolo11-s tree over the tunnel). device_put once per device and
    reuse; entries are identity-checked so checkpoint swaps (e.g. the
    multi-device eval path rotating per-device copies) invalidate naturally."""
    if device is None:
        device = jax.devices()[0]
    cache = detection_model.__dict__.setdefault("_resident_vars", {})
    entry = cache.get(device)
    if entry is None or entry[0] is not detection_model.variables:
        entry = (
            detection_model.variables,
            jax.device_put(detection_model.variables, device),
        )
        cache[device] = entry
    return entry[1]


def _prepare_image(image):
    from facedet_tpu.ops.jpeg_dct import DctImage

    if isinstance(image, DctImage):  # entropy-domain ingest (dct420)
        return image
    if isinstance(image, tuple):  # pre-decoded (Y, UV) planes (yuv420 ingest)
        y, uv = image
        if y.ndim != 2 or uv.ndim != 3 or uv.shape[-1] != 2:
            raise ValueError("yuv420 input must be (Y [H,W], UV [h2,w2,2])")
        return image
    if isinstance(image, jax.Array) and image.ndim == 3:
        # device-resident input (e.g. the enhance-first pipeline's SR output,
        # 16x the original pixels): keep it on device — fetching it to host
        # only to re-upload the padded canvas costs two full transfers of
        # the largest tensor in the system over the tunneled link
        return image
    img = np.asarray(image)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    if img.shape[-1] == 4:
        img = img[..., :3]
    return img


def _image_hw(img) -> tuple[int, int]:
    if hasattr(img, "hw"):  # DctImage
        return img.hw
    if isinstance(img, tuple):
        return img[0].shape[0], img[0].shape[1]
    return img.shape[0], img.shape[1]


def _to_yuv_planes(img) -> tuple[np.ndarray, np.ndarray]:
    if isinstance(img, tuple):
        return img
    from facedet_tpu.ops.color import rgb_to_yuv420

    return rgb_to_yuv420(img)


def _pad_yuv_planes(img, bucket_h: int, bucket_w: int):
    """(Y, UV) planes -> zero/neutral-padded bucketed planes (host numpy)."""
    y, uv = _to_yuv_planes(img)
    y_p = np.zeros((bucket_h, bucket_w), np.uint8)
    y_p[: y.shape[0], : y.shape[1]] = y
    uv_p = np.full((bucket_h // 2, bucket_w // 2, 2), 128, np.uint8)
    uv_p[: uv.shape[0], : uv.shape[1]] = uv
    return y_p, uv_p


def _display_image(img) -> np.ndarray:
    """RGB array for result objects (reconstructs YUV/DCT-ingested frames)."""
    if hasattr(img, "hw"):  # DctImage: host-side decode, crop to true size
        from facedet_tpu.ops.color import yuv420_to_rgb_np
        from facedet_tpu.ops.jpeg_dct import decode_dct420_np

        h, w = img.hw
        y, uv = decode_dct420_np(img)
        return yuv420_to_rgb_np(y[:h, :w], uv[: (h + 1) // 2, : (w + 1) // 2])
    if isinstance(img, tuple):
        from facedet_tpu.ops.color import yuv420_to_rgb_np

        return yuv420_to_rgb_np(img[0], img[1])
    if isinstance(img, jax.Array):  # device-resident input: fetch for display
        arr = np.asarray(img)
        if arr.dtype != np.uint8:
            arr = np.clip(np.rint(arr * 255.0), 0, 255).astype(np.uint8)
        return arr
    return img


def _pad_dct_planes(img, bucket_h: int, bucket_w: int):
    """DctImage -> coefficient planes zero-padded to the bucketed canvas.

    Zero AC + zero DC decodes to mid-gray; black luma padding (parity with
    the YUV path's zeroed canvas) needs DC = round(-1024 / q_dc) in the
    padded blocks. Chroma zero-pads to neutral 128 by construction."""
    from facedet_tpu.ops.jpeg_dct import DctImage, encode_dct420

    if not isinstance(img, DctImage):  # raw RGB/YUV: encode on the fly
        img = encode_dct420(img)
    yb_h, yb_w = bucket_h // 8, bucket_w // 8
    cb_h, cb_w = bucket_h // 16, bucket_w // 16
    y_dc_pad = np.int16(round(-1024.0 / float(img.qy[0])))
    y_dc = np.full((yb_h, yb_w), y_dc_pad, np.int16)
    y_ac = np.zeros((yb_h, yb_w, 64), np.int8)
    uv_dc = np.zeros((cb_h, cb_w, 2), np.int16)
    uv_ac = np.zeros((cb_h, cb_w, 2, 64), np.int8)
    sy, sx = img.y_dc.shape
    y_dc[:sy, :sx] = img.y_dc
    y_ac[:sy, :sx] = img.y_ac
    cy_, cx_ = img.uv_dc.shape[:2]
    uv_dc[:cy_, :cx_] = img.uv_dc
    uv_ac[:cy_, :cx_] = img.uv_ac
    return y_dc, y_ac, uv_dc, uv_ac, img.qy, img.qc


def _dct_wire(planes):
    """Block-major dct420 planes -> wire layout: AC coefficient-major
    (y_ac [64, Hb, Wb], uv_ac [2, 64, Hb2, Wb2]). Grouping same-frequency
    int8 statistics into long zero runs compresses ~1.9x better through the
    transparent link compressor (BENCH.md round-3 wire-layout A/B); the
    fused pipeline transposes back on device."""
    y_dc, y_ac, uv_dc, uv_ac, qy, qc = planes
    return (
        y_dc,
        np.moveaxis(y_ac, -1, 0),
        uv_dc,
        np.moveaxis(uv_ac, (2, 3), (0, 1)),
        qy,
        qc,
    )


def _stage_batch_host(imgs: list, input_format: str, bucket_h: int, bucket_w: int):
    """Same-size image batch -> host numpy batch in upload layout.

    Single-copy staging: each image's planes are written straight into
    preallocated batch buffers (a pad-then-stack pays a second full memcpy —
    measured ~13 ms/image at batch 64 on the bench host), for all three
    ingest formats. Returns the plane tuple (yuv420/dct420) or one canvas
    array (rgb); the caller moves it to device. bench.py's wall-clock
    breakdown times this exact function, so the measured host-stack cost is
    the production path's."""
    n = len(imgs)
    if input_format in ("dct420", "dct420s"):
        from facedet_tpu.ops.jpeg_dct import DctImage, encode_dct420

        yb_h, yb_w = bucket_h // 8, bucket_w // 8
        cb_h, cb_w = bucket_h // 16, bucket_w // 16
        # AC planes staged directly in wire layout (_dct_wire): coefficient-
        # major, so each frequency's near-all-zero int8 plane is contiguous
        y_dc = np.empty((n, yb_h, yb_w), np.int16)
        uv_dc = np.zeros((n, cb_h, cb_w, 2), np.int16)
        qy = np.empty((n, 64), np.float32)
        qc = np.empty((n, 64), np.float32)
        if input_format == "dct420s":
            # sparse wire: stage each image's AC straight into one flat
            # [n, total] pack buffer (y wire planes then uv, contiguous —
            # the same byte order the dense branch uploads), then batch-pack
            # into (position deltas, values) with one shared bucketed cap.
            # No intermediate dense batch or per-image concatenate copies.
            from facedet_tpu.ops.jpeg_dct import pack_sparse_ac_batch

            y_sz = 64 * yb_h * yb_w
            uv_sz = 2 * 64 * cb_h * cb_w
            flat2d = np.zeros((n, y_sz + uv_sz), np.int8)
            y_ac = flat2d[:, :y_sz].reshape(n, 64, yb_h, yb_w)
            uv_ac = flat2d[:, y_sz:].reshape(n, 2, 64, cb_h, cb_w)
        else:
            y_ac = np.zeros((n, 64, yb_h, yb_w), np.int8)
            uv_ac = np.zeros((n, 2, 64, cb_h, cb_w), np.int8)
        for i, im in enumerate(imgs):
            if not isinstance(im, DctImage):
                im = encode_dct420(im)
            # black-luma padding (parity with the YUV canvas): DC of a
            # level-shifted black block is -1024 pre-quant
            y_dc[i].fill(np.int16(round(-1024.0 / float(im.qy[0]))))
            sy, sx = im.y_dc.shape
            y_dc[i, :sy, :sx] = im.y_dc
            y_ac[i, :, :sy, :sx] = np.moveaxis(im.y_ac, -1, 0)
            cy_, cx_ = im.uv_dc.shape[:2]
            uv_dc[i, :cy_, :cx_] = im.uv_dc
            uv_ac[i, :, :, :cy_, :cx_] = np.moveaxis(im.uv_ac, (2, 3), (0, 1))
            qy[i] = im.qy
            qc[i] = im.qc
        if input_format == "dct420s":
            from facedet_tpu.ops.jpeg_dct import _wire_sections

            # ONE contiguous upload buffer: six device_puts pay tunnel
            # setup/RTT each (0.46 -> 0.32 s per 64-image batch measured);
            # the fused batch pipeline bitcast-unpacks on device. The pack
            # writes deltas/vals straight into the wire tail; only the small
            # DC/q head sections (~4.8 MB at batch 64) are copied in.
            sizes = _wire_sections(n, bucket_h, bucket_w)
            fixed = sum(sizes)
            wire = None

            def alloc(cap):
                nonlocal wire
                wire = np.empty(fixed + 3 * n * cap, np.uint8)
                d = wire[fixed : fixed + 2 * n * cap].view(np.uint16)
                v = wire[fixed + 2 * n * cap :].view(np.int8)
                return d.reshape(n, cap), v.reshape(n, cap)

            pack_sparse_ac_batch(flat2d, alloc=alloc)
            o = np.cumsum([0] + sizes)
            for a, lo, hi in zip((y_dc, uv_dc, qy, qc), o[:-1], o[1:]):
                wire[lo:hi] = a.view(np.uint8).ravel()
            return wire
        return y_dc, y_ac, uv_dc, uv_ac, qy, qc
    if input_format == "yuv420":
        y_b = np.zeros((n, bucket_h, bucket_w), np.uint8)
        uv_b = np.full((n, bucket_h // 2, bucket_w // 2, 2), 128, np.uint8)
        for i, im in enumerate(imgs):
            y, uv = _to_yuv_planes(im)
            y_b[i, : y.shape[0], : y.shape[1]] = y
            uv_b[i, : uv.shape[0], : uv.shape[1]] = uv
        return y_b, uv_b
    batch = np.zeros((n, bucket_h, bucket_w, imgs[0].shape[2]), imgs[0].dtype)
    for i, im in enumerate(imgs):
        batch[i, : im.shape[0], : im.shape[1]] = im
    return batch


def _dispatch_sliced(
    img: np.ndarray,
    detection_model: DetectionModel,
    slice_height,
    slice_width,
    overlap_height_ratio,
    overlap_width_ratio,
    perform_standard_pred,
    postprocess_type,
    postprocess_match_metric,
    postprocess_match_threshold,
    postprocess_class_agnostic,
    auto_slice_resolution,
    merge_capacity,
    use_pallas_gather,
    input_format="rgb",
    mesh=None,
    fetch_capacity=None,
):
    """Asynchronously dispatch the fused sliced pipeline for one image.

    Returns (device Detections [not yet fetched], grid, tile bucket,
    durations dict) — callers overlap several in-flight images
    (predict_stream) before blocking on device_get."""
    h, w = _image_hw(img)
    durations: dict[str, float] = {}
    t0 = time.perf_counter()
    if slice_height is None or slice_width is None:
        if not auto_slice_resolution:
            raise ValueError("slice size required when auto_slice_resolution=False")
        s = adaptive_slice_size(h, w)
        slice_height = slice_height or s
        slice_width = slice_width or s
    grid = compute_slice_grid(
        h, w, slice_height, slice_width, overlap_height_ratio, overlap_width_ratio
    )
    t_bucket = bucket_tile_count(grid.num_tiles)
    offsets, tile_valid = pad_grid_offsets(grid, t_bucket)
    # bucket the padded canvas so compilations are shared across the
    # variable-resolution image stream (SURVEY.md §7: avoid recompilation
    # storms across the 3.2k-image eval set)
    bucket_h = bucket_image_dim(grid.padded_h)
    bucket_w = bucket_image_dim(grid.padded_w)
    durations["slice"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    key = pipeline_key(
        detection_model, bucket_h, bucket_w, slice_height, slice_width,
        perform_standard_pred, postprocess_type, postprocess_match_metric,
        postprocess_match_threshold, postprocess_class_agnostic,
        merge_capacity, use_pallas_gather, input_format,
        fetch_capacity=fetch_capacity,
    )
    fused = _get_fused_pipeline(detection_model, key, mesh=mesh)
    if input_format == "yuv420":
        y_p, uv_p = _pad_yuv_planes(img, bucket_h, bucket_w)
        img_dev = (jnp.asarray(y_p), jnp.asarray(uv_p))
    elif input_format == "dct420":
        img_dev = tuple(
            jnp.asarray(p)
            for p in _dct_wire(_pad_dct_planes(img, bucket_h, bucket_w))
        )
    elif input_format == "dct420s":
        from facedet_tpu.ops.jpeg_dct import (
            pack_sparse_ac,
            sparse_cap_bucket,
            sparse_nnz_entries,
        )

        y_dc, y_ac_w, uv_dc, uv_ac_w, qy, qc = _dct_wire(
            _pad_dct_planes(img, bucket_h, bucket_w)
        )
        flat = np.concatenate([y_ac_w.ravel(), uv_ac_w.ravel()])
        nz = np.flatnonzero(flat)  # one scan, shared by sizing + pack
        cap = sparse_cap_bucket(sparse_nnz_entries(flat, nz=nz), flat.size)
        deltas, vals = pack_sparse_ac(flat, cap, nz=nz)
        img_dev = tuple(
            jnp.asarray(p) for p in (y_dc, uv_dc, qy, qc, deltas, vals)
        )
    elif isinstance(img, np.ndarray):
        if img.shape[0] != bucket_h or img.shape[1] != bucket_w:
            img_padded = np.zeros((bucket_h, bucket_w, img.shape[2]), img.dtype)
            img_padded[: img.shape[0], : img.shape[1]] = img
        else:
            img_padded = img
        img_dev = jnp.asarray(img_padded)
    else:  # already a device array (multi-device streaming path)
        img_dev = jnp.pad(
            img,
            ((0, bucket_h - img.shape[0]), (0, bucket_w - img.shape[1]), (0, 0)),
        )
    if mesh is not None:
        # replicate inputs over the mesh; the in-jit constraints shard tiles
        from jax.sharding import NamedSharding, PartitionSpec

        rep = NamedSharding(mesh, PartitionSpec())
        img_dev = jax.device_put(img_dev, rep)
        offsets_dev = jax.device_put(jnp.asarray(offsets), rep)
        tile_valid_dev = jax.device_put(jnp.asarray(tile_valid), rep)
        true_hw = jax.device_put(jnp.asarray([h, w], jnp.float32), rep)
        if getattr(detection_model, "_mesh_vars", None) is None or detection_model._mesh_vars[0] is not mesh:
            detection_model._mesh_vars = (
                mesh,
                jax.device_put(detection_model.variables, rep),
            )
        variables = detection_model._mesh_vars[1]
    else:
        leaf = img_dev[0] if isinstance(img_dev, tuple) else img_dev
        device = getattr(leaf, "devices", lambda: None)()
        if device:  # keep aux inputs on the image's (possibly non-default) device
            dev = next(iter(device))
            variables = _resident_variables(detection_model, dev)
            offsets_dev, tile_valid_dev, true_hw = _resident_grid_consts(
                offsets, tile_valid, None, h, w, dev
            )
        else:
            variables = _resident_variables(detection_model)
            offsets_dev, tile_valid_dev, true_hw = _resident_grid_consts(
                offsets, tile_valid, None, h, w
            )
    merged_dev = fused["single"](
        variables,
        img_dev,
        offsets_dev,
        tile_valid_dev,
        true_hw,
    )
    durations["prediction"] = time.perf_counter() - t0
    return merged_dev, grid, t_bucket, durations


_GRID_CONSTS: dict = {}


def _resident_grid_consts(offsets, tile_valid, n, h, w, device=None):
    """Device-committed (offsets, tile_valid, true_hw), cached by value.

    These tiny arrays were re-uploaded on every dispatch; over the tunnel
    each device_put pays ~one RTT (link_rtt_ms ~33 ms), so three of them add
    ~0.1 s per batch — pure overhead for a stream of same-size images whose
    slice grid never changes. ``n`` is the batch size (None → the single-image
    shape ``true_hw=[2]`` used by the non-batched pipeline)."""
    if device is None:
        device = jax.devices()[0]
    key = (offsets.tobytes(), tile_valid.tobytes(), n, h, w, device)
    entry = _GRID_CONSTS.get(key)
    if entry is None:
        hw = jnp.asarray([h, w], jnp.float32)
        entry = jax.device_put(
            (
                jnp.asarray(offsets),
                jnp.asarray(tile_valid),
                hw if n is None else jnp.tile(hw[None], (n, 1)),
            ),
            device,
        )
        _GRID_CONSTS[key] = entry
    return entry


def _plan_sliced_batch(imgs: list, detection_model: DetectionModel, opts: dict):
    """Host-side (cheap) batch plan: grid, buckets, pipeline key."""
    h, w = _image_hw(imgs[0])
    if any(_image_hw(im) != (h, w) for im in imgs):
        raise ValueError("batched sliced prediction requires same-size images")
    slice_height, slice_width = opts["slice_height"], opts["slice_width"]
    if slice_height is None or slice_width is None:
        s = adaptive_slice_size(h, w)
        slice_height, slice_width = slice_height or s, slice_width or s
    grid = compute_slice_grid(
        h, w, slice_height, slice_width,
        opts["overlap_height_ratio"], opts["overlap_width_ratio"],
    )
    t_bucket = bucket_tile_count(grid.num_tiles)
    offsets, tile_valid = pad_grid_offsets(grid, t_bucket)
    bucket_h = bucket_image_dim(grid.padded_h)
    bucket_w = bucket_image_dim(grid.padded_w)
    key = pipeline_key(
        detection_model, bucket_h, bucket_w, slice_height, slice_width,
        opts["perform_standard_pred"], opts["postprocess_type"],
        opts["postprocess_match_metric"], opts["postprocess_match_threshold"],
        opts["postprocess_class_agnostic"], opts["merge_capacity"],
        False, opts.get("input_format", "rgb"),
        fetch_capacity=opts.get("fetch_capacity"),
    )
    return {
        "h": h, "w": w, "n": len(imgs),
        "offsets": offsets, "tile_valid": tile_valid,
        "bucket_h": bucket_h, "bucket_w": bucket_w,
        "key": key, "input_format": opts.get("input_format", "rgb"),
    }


def _dispatch_staged_batch(plan: dict, staged, detection_model: DetectionModel,
                           device=None):
    """Upload a host-staged batch and dispatch the fused batch pipeline.
    Returns the un-fetched device Detections pytree (batch axis leading).
    ``device`` pins the upload + dispatch to a specific chip (the stream's
    round-robin data parallelism); None = the default device."""
    fused = _get_fused_pipeline(detection_model, plan["key"])
    if device is not None:
        batch_dev = jax.device_put(staged, device)
    elif isinstance(staged, tuple):
        batch_dev = tuple(jnp.asarray(a) for a in staged)
    else:
        batch_dev = jnp.asarray(staged)
    offsets_dev, tile_valid_dev, true_hw = _resident_grid_consts(
        plan["offsets"], plan["tile_valid"], plan["n"], plan["h"], plan["w"],
        device=device,
    )
    return fused["batch"](
        _resident_variables(detection_model, device),
        batch_dev,
        offsets_dev,
        tile_valid_dev,
        true_hw,
    )


def _dispatch_sliced_batch(imgs: list, detection_model: DetectionModel, opts: dict):
    """Plan + stage + upload + dispatch in one call (the non-streamed batch
    path). The streamed path runs the three phases on separate threads —
    see predict_stream_batched."""
    plan = _plan_sliced_batch(imgs, detection_model, opts)
    staged = _stage_batch_host(
        imgs, plan["input_format"], plan["bucket_h"], plan["bucket_w"]
    )
    return _dispatch_staged_batch(plan, staged, detection_model)


def get_sliced_prediction_batch(
    images,
    detection_model: DetectionModel,
    raw: bool = False,
    **sliced_kwargs,
):
    """Batched sliced prediction over SAME-SIZE images in ONE device dispatch.

    The vmapped fused pipeline broadcasts weights and the tile grid over the
    image axis, so per-dispatch and host-link overheads amortise across the
    batch — the serving-throughput analog of the reference's one-image-at-a-
    time loop. Returns a list of PredictionResult (or the batched numpy
    Detections pytree when ``raw=True``)."""
    imgs = [_prepare_image(im) for im in images]
    if not imgs:
        return []
    merged = jax.device_get(
        _dispatch_sliced_batch(imgs, detection_model, _stream_opts(sliced_kwargs))
    )
    if raw:
        return merged
    h, w = _image_hw(imgs[0])
    results = []
    for i, im in enumerate(imgs):
        det = jax.tree.map(lambda x: x[i], merged)
        preds = detections_to_object_predictions(
            det, detection_model.category_mapping, full_shape=(h, w)
        )
        results.append(
            PredictionResult(
                image=_display_image(im), object_prediction_list=preds, detections=det
            )
        )
    return results


def predict_stream_batched(
    images,
    detection_model: DetectionModel,
    batch_size: int = 8,
    window: int = 3,
    raw: bool = False,
    devices=None,
    **sliced_kwargs,
):
    """Windowed/pipelined batched sliced prediction over an image stream
    (default ``window=3`` dispatches in flight) — the serving-throughput
    configuration.

    Consecutive same-size images are grouped into ``batch_size`` batches; up
    to ``window`` batched dispatches stay in flight, so batch k+1's
    host->device upload and compute overlap batch k's result fetch. This hides
    link latency (the dominant cost over a remote-attached TPU) behind device
    compute in a way the reference's serial per-image loop
    (docs sahi/predict.py:270-288) cannot. Yields per input order: a list of
    PredictionResult per batch (or the raw batched Detections pytree when
    ``raw=True``).

    ``devices`` turns on multi-chip serving: a list of ``jax.Device`` (or a
    ``jax.sharding.Mesh``, whose devices are taken) across which consecutive
    batch dispatches round-robin. The image stream has no cross-image
    dependency, so stream-level data parallelism needs no collectives — each
    chip runs the whole fused pipeline on its own batches and N chips serve
    N batches concurrently (SURVEY §2.4's data-parallel image stream; the
    collective-based mesh path remains ``get_sliced_prediction(mesh=...)``,
    which shards one image's TILES when a single image exceeds a chip). The
    window is widened to cover all chips so none sits idle.
    """
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    opts = _stream_opts(sliced_kwargs)
    if devices is not None and hasattr(devices, "devices"):  # a Mesh
        devices = list(devices.devices.flat)
    if devices:
        window = max(window, len(devices) + 1)

    def finalize(imgs, fut):
        merged = jax.device_get(fut.result())
        if raw:
            return merged
        h, w = _image_hw(imgs[0])
        out = []
        for i, im in enumerate(imgs):
            det = jax.tree.map(lambda x: x[i], merged)
            preds = detections_to_object_predictions(
                det, detection_model.category_mapping, full_shape=(h, w)
            )
            out.append(
                PredictionResult(
                    image=_display_image(im),
                    object_prediction_list=preds,
                    detections=det,
                )
            )
        return out

    inflight: deque = deque()
    pending: list = []
    # two-stage worker pipeline: STAGE (host pack, CPU-bound) and
    # UPLOAD+DISPATCH (link-bound) run on separate single-thread executors,
    # so batch k+2's host packing overlaps batch k+1's upload while the main
    # thread blocks fetching batch k — the worker leg costs
    # max(stage, upload) instead of stage + upload (~0.26 s each per
    # 64-image sparse batch). Single threads per phase preserve dispatch
    # order; jax upload/dispatch/fetch from different threads is supported.
    stage_pool = ThreadPoolExecutor(max_workers=1)
    dispatch_pool = ThreadPoolExecutor(max_workers=1)

    n_flushed = 0

    def flush(pending):
        nonlocal n_flushed
        plan = _plan_sliced_batch(pending, detection_model, opts)
        staged_fut = stage_pool.submit(
            _stage_batch_host,
            pending, plan["input_format"], plan["bucket_h"], plan["bucket_w"],
        )
        dev = devices[n_flushed % len(devices)] if devices else None
        n_flushed += 1
        fut = dispatch_pool.submit(
            lambda: _dispatch_staged_batch(
                plan, staged_fut.result(), detection_model, device=dev
            )
        )
        inflight.append((pending, fut))

    try:
        for image in images:
            img = _prepare_image(image)
            if pending and (
                _image_hw(img) != _image_hw(pending[0]) or len(pending) >= batch_size
            ):
                flush(pending)
                pending = []
                if len(inflight) >= window:
                    yield finalize(*inflight.popleft())
            pending.append(img)
        if pending:
            flush(pending)
        while inflight:
            yield finalize(*inflight.popleft())
    finally:
        stage_pool.shutdown(wait=False)
        dispatch_pool.shutdown(wait=False)


def _stream_opts(sliced_kwargs: dict) -> dict:
    return dict(
        slice_height=sliced_kwargs.get("slice_height"),
        slice_width=sliced_kwargs.get("slice_width"),
        overlap_height_ratio=sliced_kwargs.get("overlap_height_ratio", 0.2),
        overlap_width_ratio=sliced_kwargs.get("overlap_width_ratio", 0.2),
        perform_standard_pred=sliced_kwargs.get("perform_standard_pred", True),
        postprocess_type=sliced_kwargs.get("postprocess_type", "GREEDYNMM"),
        postprocess_match_metric=sliced_kwargs.get("postprocess_match_metric", "IOS"),
        postprocess_match_threshold=sliced_kwargs.get("postprocess_match_threshold", 0.5),
        postprocess_class_agnostic=sliced_kwargs.get("postprocess_class_agnostic", False),
        auto_slice_resolution=sliced_kwargs.get("auto_slice_resolution", True),
        merge_capacity=sliced_kwargs.get("merge_capacity", 1024),
        use_pallas_gather=sliced_kwargs.get("use_pallas_gather", False),
        input_format=sliced_kwargs.get("input_format", "rgb"),
        fetch_capacity=sliced_kwargs.get("fetch_capacity"),
    )


def predict_stream(
    images,
    detection_model: DetectionModel,
    window: int = 3,
    raw: bool = False,
    **sliced_kwargs,
):
    """Pipelined sliced prediction over an image stream.

    Keeps up to ``window`` images in flight: the next images' uploads and
    device compute overlap the current image's result fetch — the
    throughput-oriented analog of the reference's serial eval loop
    (eval/eval_official_widerface.py:254-278). Yields ``PredictionResult``
    per image (or the numpy Detections pytree when ``raw=True``).
    """
    from collections import deque

    opts = _stream_opts(sliced_kwargs)

    def finalize(img, merged_dev, durations):
        merged = jax.device_get(merged_dev)
        if raw:
            return merged
        preds = detections_to_object_predictions(
            merged, detection_model.category_mapping, full_shape=_image_hw(img)
        )
        return PredictionResult(
            image=_display_image(img),
            object_prediction_list=preds,
            durations_in_seconds=durations,
            detections=merged,
        )

    inflight: deque = deque()
    for image in images:
        img = _prepare_image(image)
        merged_dev, _grid, _tb, durations = _dispatch_sliced(
            img, detection_model, **opts
        )
        inflight.append((img, merged_dev, durations))
        if len(inflight) >= window:
            yield finalize(*inflight.popleft())
    while inflight:
        yield finalize(*inflight.popleft())


def get_prediction(
    image,
    detection_model: DetectionModel,
    shift_amount: tuple[int, int] = (0, 0),
    full_shape: Optional[tuple[int, int]] = None,
    postprocess=None,
    verbose: int = 0,
) -> PredictionResult:
    """Single-image (or single-slice) inference (docs sahi/predict.py:63)."""
    img = _prepare_image(image)
    t0 = time.perf_counter()
    detection_model.perform_inference(img)
    dt = time.perf_counter() - t0
    detection_model.convert_original_predictions(
        shift_amount=shift_amount,
        full_shape=full_shape if full_shape is not None else img.shape[:2],
    )
    return PredictionResult(
        image=img,
        object_prediction_list=detection_model.object_prediction_list,
        durations_in_seconds={"prediction": dt},
    )


def get_sliced_prediction(
    image,
    detection_model: DetectionModel,
    slice_height: Optional[int] = None,
    slice_width: Optional[int] = None,
    overlap_height_ratio: float = 0.2,
    overlap_width_ratio: float = 0.2,
    perform_standard_pred: bool = True,
    postprocess_type: str = "GREEDYNMM",
    postprocess_match_metric: str = "IOS",
    postprocess_match_threshold: float = 0.5,
    postprocess_class_agnostic: bool = False,
    auto_slice_resolution: bool = True,
    merge_capacity: int = 1024,
    merge_buffer_length: Optional[int] = None,
    use_pallas_gather: bool = False,
    input_format: str = "rgb",
    mesh=None,
    fetch_capacity: Optional[int] = None,
    verbose: int = 0,
    return_image: bool = True,
) -> PredictionResult:
    """Sliced inference with global merge (docs sahi/predict.py:142).

    Signature-compatible with the reference; ``merge_capacity`` bounds the
    static detection count entering the on-device merge.
    ``merge_buffer_length`` (the reference's incremental early-merge knob,
    :295-298, a CPU-memory relief valve) is accepted for compatibility and
    folded into ``merge_capacity`` — the static-capacity merge already bounds
    memory deterministically.

    ``image`` may be a DEVICE array (jax.Array, float [0,1] or uint8): it is
    sliced/padded on device with no host round-trip — the enhance-first
    pipeline feeds its SR output through directly, saving two transfers of
    the largest tensor in the system. ``return_image=False`` skips the
    display fetch (PredictionResult.image is None) for throughput callers
    that only want boxes.
    """
    if merge_buffer_length is not None:
        merge_capacity = min(merge_capacity, max(int(merge_buffer_length), 64))
    img = _prepare_image(image)
    merged_dev, grid, t_bucket, durations = _dispatch_sliced(
        img,
        detection_model,
        slice_height,
        slice_width,
        overlap_height_ratio,
        overlap_width_ratio,
        perform_standard_pred,
        postprocess_type,
        postprocess_match_metric,
        postprocess_match_threshold,
        postprocess_class_agnostic,
        auto_slice_resolution,
        merge_capacity,
        use_pallas_gather,
        input_format=input_format,
        mesh=mesh,
        fetch_capacity=fetch_capacity,
    )
    h, w = _image_hw(img)
    slice_height = slice_height or grid.slice_h
    slice_width = slice_width or grid.slice_w
    t0 = time.perf_counter()
    # one batched host round-trip for the whole result (numpy-backed pytree)
    merged = jax.device_get(merged_dev)
    durations["prediction"] += time.perf_counter() - t0
    durations["postprocess"] = 0.0  # merged on device inside the fused dispatch

    preds = detections_to_object_predictions(
        merged, detection_model.category_mapping, full_shape=(h, w)
    )
    if verbose:
        print(
            f"Performing prediction on {grid.num_tiles} slices "
            f"(bucket {t_bucket}, {slice_height}x{slice_width}): "
            + ", ".join(f"{k}={v:.3f}s" for k, v in durations.items())
        )
    return PredictionResult(
        image=_display_image(img) if return_image else None,
        object_prediction_list=preds,
        durations_in_seconds=durations,
        detections=merged,
    )
