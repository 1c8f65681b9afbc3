// bbox_overlaps — native IoU matrix for host-side evaluation.
//
// TPU-native equivalent of the Cython extension the reference compiles from
// the external WiderFace-Evaluation repo (reference:
// eval/eval_official_widerface.py:20-33, built with `python setup.py
// build_ext --inplace`). Exposed through ctypes (facedet_tpu/eval/bbox_overlaps.py)
// with a numpy fallback; used by the official evaluator's greedy matcher where
// per-image pred x gt IoU matrices dominate host time across ~3.2k val images.
//
// Semantics match the WIDERFACE evaluation convention: +1 on widths/heights
// (inclusive pixel coordinates).
#include <cstddef>

extern "C" {

// boxes: [n, 4] xyxy, query: [k, 4] xyxy, out: [n, k] row-major IoU.
void bbox_overlaps(const double* boxes, long n, const double* query, long k,
                   double* out) {
  for (long j = 0; j < k; ++j) {
    const double qx1 = query[j * 4 + 0];
    const double qy1 = query[j * 4 + 1];
    const double qx2 = query[j * 4 + 2];
    const double qy2 = query[j * 4 + 3];
    const double q_area = (qx2 - qx1 + 1.0) * (qy2 - qy1 + 1.0);
    for (long i = 0; i < n; ++i) {
      const double bx1 = boxes[i * 4 + 0];
      const double by1 = boxes[i * 4 + 1];
      const double bx2 = boxes[i * 4 + 2];
      const double by2 = boxes[i * 4 + 3];
      const double iw =
          (bx2 < qx2 ? bx2 : qx2) - (bx1 > qx1 ? bx1 : qx1) + 1.0;
      double v = 0.0;
      if (iw > 0.0) {
        const double ih =
            (by2 < qy2 ? by2 : qy2) - (by1 > qy1 ? by1 : qy1) + 1.0;
        if (ih > 0.0) {
          const double b_area = (bx2 - bx1 + 1.0) * (by2 - by1 + 1.0);
          const double ua = b_area + q_area - iw * ih;
          v = iw * ih / ua;
        }
      }
      out[i * k + j] = v;
    }
  }
}

}  // extern "C"
