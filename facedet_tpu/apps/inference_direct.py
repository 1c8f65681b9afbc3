"""Direct single-shot detection baseline (no slicing).

Reference: pipeline_v4_yolo/inference_direct.py:15-30 — the legacy torch-hub
single-image baseline; here a plain full-image letterboxed forward.
"""
from __future__ import annotations


def main(argv=None):
    from facedet_tpu.apps.common import base_parser, build_detector
    from facedet_tpu.engine.predict import get_prediction
    from facedet_tpu.utils.config import DetectorConfig

    ap = base_parser("Direct (non-sliced) face detection baseline")
    args = ap.parse_args(argv)
    model = build_detector(
        DetectorConfig(
            family=args.family,
            scale=args.scale,
            model_path=args.model_path,
            confidence_threshold=args.conf,
            image_size=args.imgsz,
        )
    )
    from facedet_tpu.utils.viz import load_image

    result = get_prediction(load_image(args.input), model)
    for p in result.object_prediction_list:
        print(f"face conf={p.score.value:.3f} bbox={p.bbox.to_xyxy()}")
    print(f"{len(result.object_prediction_list)} faces")
    return result


if __name__ == "__main__":
    main()
