"""Pipeline v2 CLI: enhance-first, detect on the enhanced image, map back.

Reference: pipeline_v2_enhancement_first/app_v2.py — 3x3/4x4 grid slicing
rounded to x64 (:19-45), whole-image Real-ESRGAN x4, SAHI detection on the
enhanced image, boxes divided by the scale factor (:131-154) and drawn on the
original (:156).
"""
from __future__ import annotations

import os


def main(argv=None):
    from facedet_tpu.apps.common import base_parser, build_detector, build_enhancer, list_inputs
    from facedet_tpu.engine.pipelines import enhance_first_pipeline
    from facedet_tpu.utils.config import DetectorConfig, EnhancerConfig
    from facedet_tpu.utils.viz import draw_detections_on_image, load_image, save_image

    ap = base_parser("Enhance-first pipeline: full-image SR then SAHI detection")
    ap.add_argument("--outscale", type=float, default=4.0)
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
    enhancer = build_enhancer(EnhancerConfig(outscale=args.outscale))
    for path in inputs:
        name = os.path.splitext(os.path.basename(path))[0]
        image = load_image(path)
        result = enhance_first_pipeline(image, model, enhancer, slice_policy="fixed_grid")
        out_dir = os.path.join(args.output, name)
        save_image(
            os.path.join(out_dir, f"{name}_detections.jpg"),
            draw_detections_on_image(image, result.object_prediction_list),
        )
        save_image(os.path.join(out_dir, f"{name}_enhanced.jpg"), result.enhanced_image)
        print(
            f"{name}: {len(result.object_prediction_list)} faces "
            f"(enhance {result.durations_in_seconds.get('enhance', 0):.2f}s)"
        )


if __name__ == "__main__":
    main()
