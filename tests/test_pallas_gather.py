import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu


def test_tile_gather_pallas_interpret_matches_xla():
    from facedet_tpu.ops.pallas.tile_gather import gather_tiles_pallas
    from facedet_tpu.ops.tiler import gather_tiles

    img = jnp.arange(40 * 56 * 3, dtype=jnp.float32).reshape(40, 56, 3)
    offs = jnp.array([[0, 0], [8, 16], [24, 40]], jnp.int32)
    want = gather_tiles(img, offs, 16, 16)
    with pltpu.force_tpu_interpret_mode():
        got = gather_tiles_pallas(img, offs, 16, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0)
