// Greedy hard NMS — native equivalent of the reference's Cython cpu_nms
// (extract_init_states/FaceBoxes/utils/nms/cpu_nms.pyx). Fresh C++
// implementation: sort once, suppress with a flag array, O(N^2) worst case on
// the already-top-k-truncated candidate list.

#include <algorithm>
#include <cstdint>
#include <numeric>
#include <vector>

extern "C" {

// dets: (n, 5) row-major [x1, y1, x2, y2, score]; keep: out indices (cap n).
// Returns number of kept boxes.
int64_t dawn_nms(const float* dets, int64_t n, float thresh, int64_t* keep) {
  std::vector<int64_t> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    return dets[a * 5 + 4] > dets[b * 5 + 4];
  });

  std::vector<float> areas(n);
  for (int64_t i = 0; i < n; ++i) {
    const float* d = dets + i * 5;
    areas[i] = (d[2] - d[0] + 1.f) * (d[3] - d[1] + 1.f);
  }

  std::vector<uint8_t> suppressed(n, 0);
  int64_t nkeep = 0;
  for (int64_t oi = 0; oi < n; ++oi) {
    int64_t i = order[oi];
    if (suppressed[i]) continue;
    keep[nkeep++] = i;
    const float* di = dets + i * 5;
    for (int64_t oj = oi + 1; oj < n; ++oj) {
      int64_t j = order[oj];
      if (suppressed[j]) continue;
      const float* dj = dets + j * 5;
      float xx1 = std::max(di[0], dj[0]);
      float yy1 = std::max(di[1], dj[1]);
      float xx2 = std::min(di[2], dj[2]);
      float yy2 = std::min(di[3], dj[3]);
      float w = std::max(0.f, xx2 - xx1 + 1.f);
      float h = std::max(0.f, yy2 - yy1 + 1.f);
      float inter = w * h;
      float ovr = inter / (areas[i] + areas[j] - inter);
      if (ovr > thresh) suppressed[j] = 1;
    }
  }
  return nkeep;
}

}  // extern "C"
