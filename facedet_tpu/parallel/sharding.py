"""Sharding plans: FSDP-style parameter sharding, batch/tile sharding, and the
sharded sliced-inference driver.

Replaces the reference's "no backend" (SURVEY.md §2.4): data parallelism over
images and spatial parallelism over SAHI tiles, expressed as NamedShardings so
XLA inserts the all-gathers/psums over ICI. The global NMM merge is the only
cross-tile dependency — per-shard detections are all-gathered before it,
mirroring how ring/blockwise attention stitches chunk-local results.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "fsdp_param_shardings",
    "batch_sharding",
    "tile_sharding",
    "staged_sharding",
    "replicated",
    "shard_tile_batch_forward",
]


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "dp") -> NamedSharding:
    """Shard dim 0 over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def tile_sharding(mesh: Mesh, ndim: int, axis: str = "tile") -> NamedSharding:
    """Shard dim 0 (the tile axis of a [T, S, S, 3] batch) over ``axis``."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def staged_sharding(mesh: Mesh, ndim: int, axis: str = "dp") -> NamedSharding:
    """Shard dim 1 (the batch axis of HBM-staged [N, B, ...] datasets used by
    the scan-on-device train loops) over ``axis``; the stage axis replicates
    so every device indexes the same round-robin schedule."""
    return NamedSharding(mesh, P(None, axis, *([None] * (ndim - 2))))


def fsdp_param_shardings(
    params: Any, mesh: Mesh, axis: str = "tile", min_size: int = 2**14
) -> Any:
    """FSDP-style parameter sharding plan: shard the largest evenly-divisible
    dimension of each large tensor over ``axis``; small tensors replicate.
    XLA all-gathers shards on use and reduce-scatters grads."""
    ax_size = mesh.shape[axis]

    def spec(x) -> NamedSharding:
        if ax_size <= 1 or x.ndim == 0 or x.size < min_size:
            return NamedSharding(mesh, P())
        for d in sorted(range(x.ndim), key=lambda d: -x.shape[d]):
            if x.shape[d] % ax_size == 0:
                return NamedSharding(
                    mesh, P(*[axis if i == d else None for i in range(x.ndim)])
                )
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, params)


def shard_tile_batch_forward(forward_fn, mesh: Mesh, tile_axis: str = "tile"):
    """Wrap a per-tile-batch forward (tiles [T,S,S,3] -> Detections pytree with
    leading dim T) so the tile batch is sharded over the mesh; outputs come
    back fully addressable for the global merge (the all-gather is XLA's).

    The tile count must be divisible by the tile-axis size — guaranteed by
    ops.tiler.bucket_tile_count buckets (all multiples of 2)."""

    def sharded(tiles, *args):
        t_shard = tile_sharding(mesh, tiles.ndim, tile_axis)
        tiles = jax.device_put(tiles, t_shard)
        out = forward_fn(tiles, *args)
        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P())
            )
            if hasattr(x, "sharding")
            else x,
            out,
        )

    return sharded
