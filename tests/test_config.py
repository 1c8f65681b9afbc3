import json

from facedet_tpu.utils.config import (
    DetectorConfig,
    PipelineConfig,
    PostprocessConfig,
    SliceConfig,
    load_best_sahi_config,
)


def test_pipeline_config_roundtrip(tmp_path):
    cfg = PipelineConfig(
        detector=DetectorConfig(family="scrfd", confidence_threshold=0.2),
        slicing=SliceConfig(slice_height=512, policy="half_image"),
        postprocess=PostprocessConfig(postprocess_type="NMS"),
    )
    path = tmp_path / "cfg.json"
    cfg.to_json(str(path))
    back = PipelineConfig.from_json(str(path))
    assert back.detector.family == "scrfd"
    assert back.detector.confidence_threshold == 0.2
    assert back.slicing.slice_height == 512 and back.slicing.policy == "half_image"
    assert back.postprocess.postprocess_type == "NMS"
    # also parses a raw JSON string
    back2 = PipelineConfig.from_json(cfg.to_json())
    assert back2.slicing.slice_height == 512


def test_best_sahi_config_artifact(tmp_path):
    p = tmp_path / "best_sahi_config.json"
    p.write_text(
        json.dumps(
            {"slice_size": 800, "overlap": 0.3, "postprocess": "NMS", "metric": "IOU", "threshold": 0.7}
        )
    )
    sc, pc = load_best_sahi_config(str(p))
    assert sc.slice_height == 800 and sc.overlap_height_ratio == 0.3
    assert pc.postprocess_type == "NMS" and pc.postprocess_match_threshold == 0.7
