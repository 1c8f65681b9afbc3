import numpy as np
import jax

from facedet_tpu.engine.fake import FakeBlobDetectionModel
from facedet_tpu.parallel.eval_parallel import predict_stream_multidevice


def make_image(h, w, dots):
    img = np.zeros((h, w, 3), np.uint8)
    for y, x in dots:
        img[y - 1 : y + 2, x - 1 : x + 2] = 255
    return img


def test_multidevice_stream_order_and_results():
    model = FakeBlobDetectionModel(confidence_threshold=0.5)
    imgs = [make_image(100, 120, [(20 + 7 * i, 30 + 9 * i)]) for i in range(10)]
    outs = list(
        predict_stream_multidevice(
            imgs, model, raw=False, slice_height=64, slice_width=64,
            perform_standard_pred=False,
        )
    )
    assert len(outs) == 10
    for i, r in enumerate(outs):
        assert len(r.object_prediction_list) == 1
        p = r.object_prediction_list[0]
        cy = (p.bbox.miny + p.bbox.maxy) / 2
        cx = (p.bbox.minx + p.bbox.maxx) / 2
        assert abs(cy - (20 + 7 * i)) <= 1.5 and abs(cx - (30 + 9 * i)) <= 1.5
    # variables restored
    assert model.variables == {}
