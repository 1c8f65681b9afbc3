"""Overlapping-tile slicer — TPU-native SAHI ``slice_image``.

The reference slices on host with PIL crops, one tile at a time
(docs sahi/predict.py:229-288, "currently only 1 batch supported"). Here the
grid is a pure host function with SAHI-parity placement semantics, and the
pixel movement is one device gather producing a static ``[T, S, S, 3]`` tile
batch in HBM — so the whole detector forward runs over every tile in a single
XLA dispatch. A Pallas DMA kernel variant is provided for the gather
(ops/pallas/tile_gather.py).

Grid semantics match ``sahi.slicing.get_slice_bboxes``: stride = S - overlap*S,
edge tiles are shifted inward so every tile is exactly S×S; images smaller than
S are padded (the reference instead emits a smaller crop and letterboxes it —
equivalent detector input up to border pixels).

Adaptive policies reproduced from the reference:
  * half_image  — pipeline_v1_detection_first/app_v1.py:44-51
  * fixed_grid  — pipeline_v2_enhancement_first/app_v2.py:19-45
  * resolution_bucketed — eval/eval_official_widerface.py:160-164
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "TileGrid",
    "compute_slice_grid",
    "adaptive_slice_size",
    "half_image_slice_size",
    "fixed_grid_slice_params",
    "pad_image",
    "gather_tiles",
    "bucket_tile_count",
]


@dataclasses.dataclass(frozen=True)
class TileGrid:
    """Static description of a slicing plan for one image shape."""

    offsets: np.ndarray  # [T, 2] int32 (y, x) top-left corners, exact-S tiles
    slice_h: int
    slice_w: int
    image_h: int  # original image shape
    image_w: int
    padded_h: int  # shape the image must be padded to before gathering
    padded_w: int

    @property
    def num_tiles(self) -> int:
        return int(self.offsets.shape[0])


def compute_slice_grid(
    image_h: int,
    image_w: int,
    slice_h: int,
    slice_w: int,
    overlap_h: float = 0.2,
    overlap_w: float = 0.2,
) -> TileGrid:
    """SAHI-parity overlapping window grid (host, static)."""
    if slice_h <= 0 or slice_w <= 0:
        raise ValueError("slice size must be positive")
    y_step = max(slice_h - int(overlap_h * slice_h), 1)
    x_step = max(slice_w - int(overlap_w * slice_w), 1)

    ys: list[int] = []
    y = 0
    while True:
        if y + slice_h >= image_h:
            ys.append(max(0, image_h - slice_h))
            break
        ys.append(y)
        y += y_step
    xs: list[int] = []
    x = 0
    while True:
        if x + slice_w >= image_w:
            xs.append(max(0, image_w - slice_w))
            break
        xs.append(x)
        x += x_step

    offsets = np.array(
        [(yy, xx) for yy in sorted(set(ys)) for xx in sorted(set(xs))],
        dtype=np.int32,
    ).reshape(-1, 2)
    return TileGrid(
        offsets=offsets,
        slice_h=slice_h,
        slice_w=slice_w,
        image_h=image_h,
        image_w=image_w,
        padded_h=max(image_h, slice_h),
        padded_w=max(image_w, slice_w),
    )


def adaptive_slice_size(image_h: int, image_w: int) -> int:
    """Resolution-bucketed slice size (eval/eval_official_widerface.py:160-164)."""
    max_dim = max(image_h, image_w)
    if max_dim > 2500:
        return 512
    if max_dim > 1500:
        return 416
    return 320


def half_image_slice_size(image_h: int, image_w: int, base: int = 512) -> tuple[int, int]:
    """Half-image slices for small inputs (app_v1.py:44-51)."""
    sh = image_h // 2 if image_h < int(1.5 * base) else base
    sw = image_w // 2 if image_w < int(1.5 * base) else base
    return max(sh, 64), max(sw, 64)


def fixed_grid_slice_params(
    image_h: int, image_w: int, round_to: int = 64
) -> tuple[int, int, float]:
    """3x3 / 4x4 grid with dims rounded up to x64, overlap 0.2 (app_v2.py:19-45)."""
    n = 3 if max(image_h, image_w) < 3000 else 4
    sh = math.ceil(image_h / n / round_to) * round_to
    sw = math.ceil(image_w / n / round_to) * round_to
    return sh, sw, 0.2


def bucket_tile_count(num_tiles: int) -> int:
    """Round tile counts up to coarse buckets to bound jit recompilation
    across a variable-resolution image stream (e.g. WIDERFACE val)."""
    for b in (1, 2, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128):
        if num_tiles <= b:
            return b
    return int(2 ** math.ceil(math.log2(num_tiles)))


def pad_grid_offsets(grid: TileGrid, target_tiles: int) -> tuple[np.ndarray, np.ndarray]:
    """Pad the offset list to ``target_tiles`` rows (repeating offset 0) and
    return (offsets [T,2], tile_valid [T] bool)."""
    t = grid.num_tiles
    if target_tiles < t:
        raise ValueError(f"target_tiles {target_tiles} < actual tiles {t}")
    offsets = np.zeros((target_tiles, 2), np.int32)
    offsets[:t] = grid.offsets
    valid = np.zeros((target_tiles,), bool)
    valid[:t] = True
    return offsets, valid


def bucket_image_dim(x: int, multiple: int = 256) -> int:
    """Round an image dimension up to a coarse bucket so jit compilations are
    shared across the variable-resolution image stream (e.g. WIDERFACE val),
    instead of recompiling per unique (H, W)."""
    return max(multiple, -(-x // multiple) * multiple)


def pad_image(image: jax.Array, padded_h: int, padded_w: int) -> jax.Array:
    """Zero-pad bottom/right so every tile lies in bounds."""
    h, w = image.shape[0], image.shape[1]
    if h == padded_h and w == padded_w:
        return image
    return jnp.pad(image, ((0, padded_h - h), (0, padded_w - w), (0, 0)))


def gather_tiles(
    image: jax.Array,
    offsets: jax.Array,
    slice_h: int,
    slice_w: int,
    use_pallas: bool = False,
) -> jax.Array:
    """[H,W,3] + [T,2] offsets -> [T,slice_h,slice_w,3] tile batch (on device)."""
    if use_pallas:
        from facedet_tpu.ops.pallas.tile_gather import gather_tiles_pallas

        return gather_tiles_pallas(image, offsets, slice_h, slice_w)

    def one(off):
        return jax.lax.dynamic_slice(
            image, (off[0], off[1], 0), (slice_h, slice_w, image.shape[2])
        )

    return jax.vmap(one)(offsets)
