// Connected-components labeling (8-connectivity) + component areas.
//
// Native replacement for the reference's CUDA kernel dependency
// (ref: model/sam2.py:4161-4175 JIT-compiles connected_components.cu from
// facebookresearch/sam2). Used by mask post-processing
// (fill_holes_in_mask_scores, ref :4134-4146).
//
// Union-find over each (H, W) mask; labels are 1-based component ids on
// foreground pixels, 0 on background; areas carry the component pixel
// count at every labeled pixel (mirroring the CUDA kernel's outputs).
//
// Build: g++ -O3 -shared -fPIC -o libcc.so connected_components.cpp
#include <cstdint>
#include <vector>

namespace {

struct DSU {
  std::vector<int32_t> parent;
  explicit DSU(size_t n) : parent(n) {
    for (size_t i = 0; i < n; ++i) parent[i] = static_cast<int32_t>(i);
  }
  int32_t find(int32_t x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];
      x = parent[x];
    }
    return x;
  }
  void unite(int32_t a, int32_t b) {
    a = find(a);
    b = find(b);
    if (a != b) parent[b] = a;
  }
};

}  // namespace

extern "C" {

// mask: N * H * W uint8 (nonzero = foreground)
// labels_out: N * H * W int32 (0 background, 1..K component ids)
// areas_out: N * H * W int32 (component area at each labeled pixel)
void connected_components(const uint8_t* mask, int32_t n, int32_t h,
                          int32_t w, int32_t* labels_out,
                          int32_t* areas_out) {
  const int64_t plane = static_cast<int64_t>(h) * w;
  for (int32_t img = 0; img < n; ++img) {
    const uint8_t* m = mask + img * plane;
    int32_t* lab = labels_out + img * plane;
    int32_t* area = areas_out + img * plane;

    DSU dsu(plane);
    // union pass: left, up, up-left, up-right neighbors (8-connectivity)
    for (int32_t y = 0; y < h; ++y) {
      for (int32_t x = 0; x < w; ++x) {
        const int64_t i = static_cast<int64_t>(y) * w + x;
        if (!m[i]) continue;
        if (x > 0 && m[i - 1]) dsu.unite((int32_t)i, (int32_t)(i - 1));
        if (y > 0) {
          const int64_t up = i - w;
          if (m[up]) dsu.unite((int32_t)i, (int32_t)up);
          if (x > 0 && m[up - 1]) dsu.unite((int32_t)i, (int32_t)(up - 1));
          if (x + 1 < w && m[up + 1])
            dsu.unite((int32_t)i, (int32_t)(up + 1));
        }
      }
    }
    // relabel roots to compact 1..K ids and count areas
    std::vector<int32_t> compact(plane, 0);
    std::vector<int32_t> counts;
    counts.push_back(0);  // background
    int32_t next_id = 1;
    for (int64_t i = 0; i < plane; ++i) {
      if (!m[i]) {
        lab[i] = 0;
        continue;
      }
      int32_t root = dsu.find((int32_t)i);
      if (compact[root] == 0) {
        compact[root] = next_id++;
        counts.push_back(0);
      }
      lab[i] = compact[root];
      counts[lab[i]] += 1;
    }
    for (int64_t i = 0; i < plane; ++i) {
      area[i] = counts[lab[i]];
    }
  }
}

}  // extern "C"
