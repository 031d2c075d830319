// Native host-side detection ops.
//
// TPU-native replacement for the reference's host/CPU kernels:
//   greedy NMS        — /root/reference/lib/model/csrc/cpu/nms_cpu.cpp:6-75
//   pairwise box IoU  — /root/reference/lib/model/utils/bbox.pyx (cython)
//
// The device path runs NMS/IoU as XLA/Pallas (ops/nms.py, core/boxes.py);
// this library serves the host-side eval/tooling path (utils.NMS, dataset
// evaluation) where arrays are small and a device round-trip costs more
// than the compute.  Built as a plain shared object, bound via ctypes —
// no pybind11 dependency.
//
// Conventions match the reference: boxes are (x1, y1, x2, y2) with the
// legacy +1 width/height; suppression uses IoU > threshold.

#include <algorithm>
#include <cstdint>
#include <numeric>
#include <vector>

extern "C" {

// out[i*k + j] = IoU(boxes[i], query[j]); +1 convention (bbox.pyx).
void bbox_overlaps(const float* boxes, int64_t n, const float* query,
                   int64_t k, float* out) {
  for (int64_t j = 0; j < k; ++j) {
    const float* q = query + j * 4;
    const float q_area = (q[2] - q[0] + 1.0f) * (q[3] - q[1] + 1.0f);
    for (int64_t i = 0; i < n; ++i) {
      const float* b = boxes + i * 4;
      const float iw =
          std::min(b[2], q[2]) - std::max(b[0], q[0]) + 1.0f;
      float v = 0.0f;
      if (iw > 0) {
        const float ih =
            std::min(b[3], q[3]) - std::max(b[1], q[1]) + 1.0f;
        if (ih > 0) {
          const float ua = (b[2] - b[0] + 1.0f) * (b[3] - b[1] + 1.0f) +
                           q_area - iw * ih;
          v = iw * ih / ua;
        }
      }
      out[i * k + j] = v;
    }
  }
}

// Greedy score-descending NMS. Returns the number of kept boxes; their
// input indices land in keep_out[0..ret). Parity: nms_cpu.cpp:6-75.
int64_t greedy_nms(const float* boxes, const float* scores, int64_t n,
                   float thresh, int64_t* keep_out, int64_t max_keep) {
  std::vector<int64_t> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(),
                   [&](int64_t a, int64_t b) { return scores[a] > scores[b]; });
  std::vector<float> areas(n);
  for (int64_t i = 0; i < n; ++i) {
    const float* b = boxes + i * 4;
    areas[i] = (b[2] - b[0] + 1.0f) * (b[3] - b[1] + 1.0f);
  }
  std::vector<char> suppressed(n, 0);
  int64_t kept = 0;
  for (int64_t oi = 0; oi < n && kept < max_keep; ++oi) {
    const int64_t i = order[oi];
    if (suppressed[i]) continue;
    keep_out[kept++] = i;
    const float* bi = boxes + i * 4;
    for (int64_t oj = oi + 1; oj < n; ++oj) {
      const int64_t j = order[oj];
      if (suppressed[j]) continue;
      const float* bj = boxes + j * 4;
      const float iw = std::min(bi[2], bj[2]) - std::max(bi[0], bj[0]) + 1.0f;
      if (iw <= 0) continue;
      const float ih = std::min(bi[3], bj[3]) - std::max(bi[1], bj[1]) + 1.0f;
      if (ih <= 0) continue;
      const float inter = iw * ih;
      const float ovr = inter / (areas[i] + areas[j] - inter);
      if (ovr > thresh) suppressed[j] = 1;
    }
  }
  return kept;
}

}  // extern "C"
