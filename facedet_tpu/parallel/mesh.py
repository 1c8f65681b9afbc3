"""Device mesh construction and axis conventions.

The reference is strictly single-device (SURVEY.md §2.4: hardcoded 'cuda:0',
serial slice loop). The TPU framework scales along the two latent parallel
axes of the workload:

  * ``dp``   — data parallelism over the image stream (eval loops over ~3.2k
               WIDERFACE val images; training batches)
  * ``tile`` — spatial parallelism over the SAHI tile batch of one image
               (the image-pipeline analog of sequence/context parallelism);
               doubles as an FSDP axis for parameter sharding in training.

Collectives ride ICI inside a slice via jax.lax (psum/all_gather); no
NCCL/MPI — XLA inserts them from shardings.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["create_mesh", "mesh_shape_for", "NamedSharding", "P"]


def mesh_shape_for(n_devices: int, prefer_tile: int = 2) -> tuple[int, int]:
    """Factor n devices into (dp, tile); tile gets ``prefer_tile`` when it
    divides evenly, else everything goes to dp."""
    if n_devices % prefer_tile == 0 and n_devices > 1:
        return n_devices // prefer_tile, prefer_tile
    return n_devices, 1


def create_mesh(
    n_devices: int | None = None,
    axis_names: tuple[str, str] = ("dp", "tile"),
    shape: tuple[int, int] | None = None,
) -> Mesh:
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
    if shape is None:
        shape = mesh_shape_for(n_devices)
    dev_array = np.asarray(devices[:n_devices]).reshape(shape)
    return Mesh(dev_array, axis_names)
