"""Pallas DMA kernel: HBM image -> static tile batch.

Replaces the reference's host-side PIL crop loop (docs sahi/predict.py:229-288)
with per-tile async DMA from the full-resolution image resident in HBM into the
``[T, S, S, C]`` output, one grid step per tile. Offsets arrive via scalar
prefetch so the DMA addresses are known before the kernel body runs.

Status: validated in interpret mode (tests/test_pallas_gather.py). This
environment's remote TPU compile service rejects ANY dynamic-offset indexing
driven by prefetched scalars (HTTP 500 from tpu_compile_helper — bisected:
static-offset DMA and scalar-prefetch compute both compile; dynamic ``pl.ds``
from a prefetched scalar does not, for both DMA and VMEM loads). The XLA
gather path (ops/tiler.gather_tiles) measures 0.21 ms for a 6-tile 640x640
batch on the v5e — not a bottleneck — so XLA remains the default and this
kernel is opt-in for environments with a full Mosaic toolchain.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tile_gather_kernel(offs_ref, img_ref, out_ref, sem):
    t = pl.program_id(0)
    oy = offs_ref[t, 0]
    ox = offs_ref[t, 1]
    cp = pltpu.make_async_copy(
        img_ref.at[pl.ds(oy, out_ref.shape[1]), pl.ds(ox, out_ref.shape[2]), :],
        out_ref.at[0],
        sem,
    )
    cp.start()
    cp.wait()


def gather_tiles_pallas(
    image: jax.Array, offsets: jax.Array, slice_h: int, slice_w: int
) -> jax.Array:
    """image [H,W,C] (HBM) + offsets [T,2] (y,x) -> tiles [T,slice_h,slice_w,C]."""
    num_tiles = offsets.shape[0]
    c = image.shape[2]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, slice_h, slice_w, c),
            lambda t, offs: (t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        _tile_gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, slice_h, slice_w, c), image.dtype),
    )(jnp.asarray(offsets, jnp.int32), image)
