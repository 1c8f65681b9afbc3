"""Enhance-first YOLO CLI (x2 SR -> SAHI detect on the enhanced image).

Reference: pipeline_v4_yolo/app_yolo_full.py:86-187 — full-image Real-ESRGAN
x2, sliced detection on the enhanced image, visualization/crops in ENHANCED
coordinates, summary annotated with the pipeline info. (Unlike app_v2 the
outputs stay in enhanced-image space.)
"""
from __future__ import annotations

import os
import time


def main(argv=None):
    import numpy as np

    from facedet_tpu.apps.common import base_parser, build_detector, build_enhancer, list_inputs
    from facedet_tpu.engine.predict import get_sliced_prediction
    from facedet_tpu.utils.config import DetectorConfig, EnhancerConfig
    from facedet_tpu.utils.viz import (
        create_detection_summary,
        draw_detections_on_image,
        load_image,
        save_face_crops,
        save_image,
    )

    ap = base_parser("Enhance-first (x2) + SAHI detection, enhanced-coords output")
    args = ap.parse_args(argv)
    inputs = list_inputs(args.input)
    model = build_detector(
        DetectorConfig(
            family=args.family,
            scale=args.scale,
            model_path=args.model_path,
            confidence_threshold=args.conf,
            image_size=args.imgsz,
        )
    )
    enhancer = build_enhancer(
        EnhancerConfig(model_name="RealESRGAN_x2plus", outscale=2.0)
    )
    for path in inputs:
        name = os.path.splitext(os.path.basename(path))[0]
        out_dir = os.path.join(args.output, name)
        image = load_image(path)
        t0 = time.perf_counter()
        # SR output stays on device through the sliced detection; the
        # result's display fetch doubles as the host enhanced image for
        # viz/crops (one transfer instead of fetch + canvas re-upload)
        import jax.numpy as jnp

        enhanced_dev = enhancer.enhance_array(
            jnp.asarray(image, jnp.float32) / 255.0
        )
        import jax

        jax.block_until_ready(enhanced_dev)  # honest enhance timing
        enhance_dt = time.perf_counter() - t0
        result = get_sliced_prediction(
            enhanced_dev,
            model,
            slice_height=args.slice,
            slice_width=args.slice,
            overlap_height_ratio=args.overlap,
            overlap_width_ratio=args.overlap,
            postprocess_type="GREEDYNMM",
            postprocess_match_metric="IOS",
            postprocess_match_threshold=0.5,
            postprocess_class_agnostic=True,
        )
        preds = result.object_prediction_list
        enhanced = result.image
        save_image(
            os.path.join(out_dir, f"{name}_enhanced_detections.jpg"),
            draw_detections_on_image(enhanced, preds),
        )
        save_face_crops(enhanced, preds, os.path.join(out_dir, "crops"), prefix=f"{name}_face")
        create_detection_summary(
            preds,
            image_name=name,
            output_path=os.path.join(out_dir, f"{name}_summary.txt"),
            extra_info={
                "pipeline": "Real-ESRGAN x2 -> SAHI detection (enhanced coords)",
                "enhance_seconds": f"{enhance_dt:.2f}",
                "total_seconds": f"{time.perf_counter() - t0:.2f}",
            },
        )
        print(f"{name}: {len(preds)} faces on enhanced image")


if __name__ == "__main__":
    main()
