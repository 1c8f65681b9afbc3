import jax.numpy as jnp
import numpy as np

from facedet_tpu.ops import tiler as T


def sahi_reference_grid(image_h, image_w, slice_h, slice_w, oh, ow):
    """Literal transcription of the published SAHI get_slice_bboxes algorithm
    (pip sahi.slicing), used as the golden oracle."""
    slice_bboxes = []
    y_max = y_min = 0
    y_overlap = int(oh * slice_h)
    x_overlap = int(ow * slice_w)
    while y_max < image_h:
        x_min = x_max = 0
        y_max = y_min + slice_h
        while x_max < image_w:
            x_max = x_min + slice_w
            if y_max > image_h or x_max > image_w:
                xmax = min(image_w, x_max)
                ymax = min(image_h, y_max)
                xmin = max(0, xmax - slice_w)
                ymin = max(0, ymax - slice_h)
                slice_bboxes.append([xmin, ymin, xmax, ymax])
            else:
                slice_bboxes.append([x_min, y_min, x_max, y_max])
            x_min = x_max - x_overlap
        y_min = y_max - y_overlap
    return slice_bboxes


def test_grid_matches_sahi_semantics():
    cases = [
        (1080, 1920, 640, 640, 0.2, 0.2),
        (640, 640, 640, 640, 0.2, 0.2),
        (1152, 1153, 640, 640, 0.2, 0.2),
        (3000, 4000, 512, 512, 0.25, 0.25),
        (719, 1281, 320, 320, 0.1, 0.1),
    ]
    for h, w, sh, sw, oh, ow in cases:
        grid = T.compute_slice_grid(h, w, sh, sw, oh, ow)
        golden = sahi_reference_grid(h, w, sh, sw, oh, ow)
        golden_offsets = sorted({(b[1], b[0]) for b in golden})
        got = sorted({tuple(o) for o in grid.offsets.tolist()})
        assert got == golden_offsets, (h, w, got, golden_offsets)


def test_small_image_pads():
    grid = T.compute_slice_grid(100, 90, 640, 640, 0.2, 0.2)
    assert grid.num_tiles == 1
    assert grid.padded_h == 640 and grid.padded_w == 640
    np.testing.assert_array_equal(grid.offsets, [[0, 0]])


def test_gather_tiles_xla():
    img = jnp.arange(20 * 30 * 3, dtype=jnp.float32).reshape(20, 30, 3)
    offs = jnp.array([[0, 0], [4, 6]], jnp.int32)
    tiles = T.gather_tiles(img, offs, 8, 8)
    assert tiles.shape == (2, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(tiles[0]), np.asarray(img[:8, :8]))
    np.testing.assert_allclose(np.asarray(tiles[1]), np.asarray(img[4:12, 6:14]))


def test_gather_full_pipeline_padding():
    img = jnp.ones((700, 1000, 3), jnp.uint8)
    grid = T.compute_slice_grid(700, 1000, 640, 640, 0.2, 0.2)
    padded = T.pad_image(img, grid.padded_h, grid.padded_w)
    tiles = T.gather_tiles(padded, jnp.asarray(grid.offsets), 640, 640)
    assert tiles.shape == (grid.num_tiles, 640, 640, 3)


def test_adaptive_policies():
    assert T.adaptive_slice_size(3000, 1000) == 512
    assert T.adaptive_slice_size(1600, 900) == 416
    assert T.adaptive_slice_size(800, 600) == 320
    # app_v1: below 1.5*512=768 -> half image
    assert T.half_image_slice_size(700, 900) == (350, 512)
    sh, sw, ov = T.fixed_grid_slice_params(2000, 2500)
    assert sh % 64 == 0 and sw % 64 == 0 and ov == 0.2
    assert sh >= 2000 / 3 and sw >= 2500 / 3
    sh4, _, _ = T.fixed_grid_slice_params(3500, 3500)
    assert sh4 >= 3500 / 4 and sh4 % 64 == 0


def test_bucket_and_pad_offsets():
    grid = T.compute_slice_grid(1080, 1920, 640, 640, 0.2, 0.2)
    b = T.bucket_tile_count(grid.num_tiles)
    assert b >= grid.num_tiles
    offs, valid = T.pad_grid_offsets(grid, b)
    assert offs.shape == (b, 2) and valid.sum() == grid.num_tiles


def test_grid_matches_sahi_randomized():
    rng = np.random.default_rng(11)
    for _ in range(25):
        h = int(rng.integers(100, 4000))
        w = int(rng.integers(100, 4000))
        s = int(rng.choice([320, 416, 512, 640, 800]))
        ov = float(rng.choice([0.1, 0.2, 0.25, 0.3, 0.4]))
        grid = T.compute_slice_grid(h, w, s, s, ov, ov)
        golden = sahi_reference_grid(h, w, s, s, ov, ov)
        golden_offsets = sorted(
            {(max(0, b[1]), max(0, b[0])) for b in golden}
        )
        got = sorted({tuple(o) for o in grid.offsets.tolist()})
        assert got == golden_offsets, (h, w, s, ov)
