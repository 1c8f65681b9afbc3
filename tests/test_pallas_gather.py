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


def test_static_kernel_interpret_parity():
    """The static-offset formulation (the one that compiles on the real axon
    TPU — validated r2) in interpret mode: parity vs direct slicing."""
    import jax
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    from facedet_tpu.ops.pallas.tile_gather import (
        gather_tiles_pallas_static,
        pallas_gather_alignment_ok,
    )

    offs = ((0, 0), (0, 128), (8, 256))
    assert pallas_gather_alignment_ok(offs)
    img = np.random.default_rng(0).integers(0, 255, (3, 72, 512), np.uint8)
    with pltpu.force_tpu_interpret_mode():
        out = gather_tiles_pallas_static(jax.numpy.asarray(img), offs, 64, 128)
    want = np.stack([img[:, y : y + 64, x : x + 128] for y, x in offs])
    np.testing.assert_array_equal(np.asarray(out), want)


def test_static_kernel_rejects_unaligned():
    import numpy as np
    import pytest

    from facedet_tpu.ops.pallas.tile_gather import (
        gather_tiles_pallas_static,
        pallas_gather_alignment_ok,
    )

    assert not pallas_gather_alignment_ok([(0, 0), (51, 153)])
    img = np.zeros((3, 128, 256), np.uint8)
    with pytest.raises(ValueError, match="aligned"):
        gather_tiles_pallas_static(img, [(51, 153)], 64, 128)


def test_production_grid_is_aligned():
    """The headline 1024x1536 / 640 / 0.2 SAHI grid satisfies the static
    kernel's alignment contract."""
    import numpy as np

    from facedet_tpu.ops.pallas.tile_gather import pallas_gather_alignment_ok
    from facedet_tpu.ops.tiler import compute_slice_grid

    grid = compute_slice_grid(1024, 1536, 640, 640, 0.2, 0.2)
    assert pallas_gather_alignment_ok(np.asarray(grid.offsets))
