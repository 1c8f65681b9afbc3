"""Raw SCRFD/RetinaFace direct detection CLI (no SAHI).

Reference: pipeline_v1_detection_first/app_retinaface.py:6-31 — raw
``FaceAnalysis`` detection on one image; and app_sahi_detection.py — the same
detector through SAHI without enhancement.
"""
from __future__ import annotations

import os


def main(argv=None):
    import numpy as np

    from facedet_tpu.apps.common import base_parser, list_inputs
    from facedet_tpu.engine.scrfd_wrapper import FaceAnalysis
    from facedet_tpu.utils.viz import draw_detections_on_image, load_image, save_image
    from facedet_tpu.engine.prediction import ObjectPrediction

    ap = base_parser("Raw SCRFD/RetinaFace direct detection")
    ap.add_argument("--det-size", type=int, default=640)
    ap.add_argument("--det-thresh", type=float, default=0.5)
    args = ap.parse_args(argv)

    fa = FaceAnalysis(name="scrfd_2.5g", model_path=args.model_path)
    fa.prepare(ctx_id=0, det_size=(args.det_size, args.det_size), det_thresh=args.det_thresh)
    for path in list_inputs(args.input):
        img = load_image(path)
        faces = fa.get(img)
        preds = [
            ObjectPrediction(
                bbox=f.bbox,
                score=f.det_score,
                keypoints=np.concatenate([f.kps, np.ones((len(f.kps), 1))], -1),
            )
            for f in faces
        ]
        name = os.path.splitext(os.path.basename(path))[0]
        save_image(
            os.path.join(args.output, f"{name}_retinaface.jpg"),
            draw_detections_on_image(img, preds),
        )
        print(f"{name}: {len(faces)} faces")


if __name__ == "__main__":
    main()
