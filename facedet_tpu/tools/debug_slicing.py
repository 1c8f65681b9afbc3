"""Slicing-engine debug harness / golden test.

Reference: scripts/debug_slicing.py:74-121 — slice one image, save every tile,
run per-tile detection with per-tile visualizations, then run the full
slice-detect-merge and save the merged result for visual comparison.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def debug_slicing(
    image: np.ndarray,
    detection_model,
    output_dir: str,
    slice_size: int = 640,
    overlap: float = 0.2,
) -> dict:
    from facedet_tpu.engine.predict import get_sliced_prediction
    from facedet_tpu.engine.prediction import detections_to_object_predictions
    from facedet_tpu.ops.tiler import compute_slice_grid, gather_tiles, pad_image
    from facedet_tpu.utils.viz import draw_detections_on_image, save_image

    os.makedirs(output_dir, exist_ok=True)
    h, w = image.shape[:2]
    grid = compute_slice_grid(h, w, slice_size, slice_size, overlap, overlap)
    imgf = jnp.asarray(image, jnp.float32) / 255.0
    padded = pad_image(imgf, grid.padded_h, grid.padded_w)
    tiles = gather_tiles(padded, jnp.asarray(grid.offsets), slice_size, slice_size)

    # save each tile + its per-tile detections
    per_tile = detection_model.forward_tiles(tiles)
    tile_info = []
    for t in range(grid.num_tiles):
        tile8 = np.asarray(jnp.round(tiles[t] * 255)).astype(np.uint8)
        save_image(os.path.join(output_dir, f"tile_{t:02d}.jpg"), tile8)
        det_t = jax.tree.map(lambda x: x[t], per_tile)
        preds = detections_to_object_predictions(det_t)
        save_image(
            os.path.join(output_dir, f"tile_{t:02d}_det.jpg"),
            draw_detections_on_image(tile8, preds),
        )
        tile_info.append({"tile": t, "offset": grid.offsets[t].tolist(), "dets": len(preds)})

    # full merged pipeline
    result = get_sliced_prediction(
        image,
        detection_model,
        slice_height=slice_size,
        slice_width=slice_size,
        overlap_height_ratio=overlap,
        overlap_width_ratio=overlap,
        perform_standard_pred=False,
    )
    save_image(
        os.path.join(output_dir, "merged.jpg"),
        draw_detections_on_image(image, result.object_prediction_list),
    )
    return {
        "num_tiles": grid.num_tiles,
        "tiles": tile_info,
        "merged_detections": len(result.object_prediction_list),
    }


def main(argv=None):
    from facedet_tpu.apps.common import base_parser, build_detector
    from facedet_tpu.utils.config import DetectorConfig
    from facedet_tpu.utils.viz import load_image

    ap = base_parser("Slicing debug harness: per-tile dumps + merged result")
    args = ap.parse_args(argv)
    model = build_detector(
        DetectorConfig(family=args.family, scale=args.scale, model_path=args.model_path,
                       confidence_threshold=args.conf, image_size=args.imgsz)
    )
    info = debug_slicing(load_image(args.input), model, args.output, args.slice, args.overlap)
    print(info)


if __name__ == "__main__":
    main()
