// Native BVH builder for dsrt_tpu.
//
// Host-side scene-compile kernel mirroring the NumPy builders in
// models/bvh_build.py (which themselves reproduce the semantics of the
// reference's CPU builder, src/gpu_scene_builder.cpp:343-459): median split
// on the largest-extent centroid axis via nth_element, leaf <= 4
// triangles, degenerate-centroid leaves, preorder node emission with
// left-child == parent+1; plus a binned-SAH mode with a median fallback
// and a depth cap that keeps traversal stacks within 64 entries.
//
// Flat-extent boxes are padded (FLAT_EPS) exactly like the Python builder —
// the deliberate fix for the reference's invisible axis-aligned triangles.
//
// C ABI (ctypes-friendly); exact-match contract with the Python "median"
// builder is covered by tests/test_bvh.py.
//
// Build: make -C dsrt_tpu/native

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

constexpr int kMaxLeaf = 4;
constexpr int kSahBins = 16;
constexpr int kSahDepthCap = 48;  // force median below this depth
constexpr float kFlatEps = 1e-4f;

struct F3 {
  float x, y, z;
};

struct Builder {
  const float* v0;
  const float* v1;
  const float* v2;
  int n;
  std::vector<F3> lo, hi, cent;
  std::vector<int32_t> indices;

  // node arrays (output)
  std::vector<F3> bmin, bmax;
  std::vector<int32_t> left, right, offset, count;

  void prepare() {
    lo.resize(n);
    hi.resize(n);
    cent.resize(n);
    indices.resize(n);
    for (int i = 0; i < n; ++i) {
      const float* a = v0 + 3 * i;
      const float* b = v1 + 3 * i;
      const float* c = v2 + 3 * i;
      lo[i] = {std::min(a[0], std::min(b[0], c[0])),
               std::min(a[1], std::min(b[1], c[1])),
               std::min(a[2], std::min(b[2], c[2]))};
      hi[i] = {std::max(a[0], std::max(b[0], c[0])),
               std::max(a[1], std::max(b[1], c[1])),
               std::max(a[2], std::max(b[2], c[2]))};
      cent[i] = {(a[0] + b[0] + c[0]) / 3.f, (a[1] + b[1] + c[1]) / 3.f,
                 (a[2] + b[2] + c[2]) / 3.f};
      indices[i] = i;
    }
  }

  int emit_node(int start, int end) {
    F3 mn = lo[indices[start]];
    F3 mx = hi[indices[start]];
    for (int i = start + 1; i < end; ++i) {
      const F3& a = lo[indices[i]];
      const F3& b = hi[indices[i]];
      mn = {std::min(mn.x, a.x), std::min(mn.y, a.y), std::min(mn.z, a.z)};
      mx = {std::max(mx.x, b.x), std::max(mx.y, b.y), std::max(mx.z, b.z)};
    }
    // flat-extent padding (models/bvh_build.py _pad_flat)
    if (mx.x - mn.x < kFlatEps) { mn.x -= kFlatEps * 0.5f; mx.x += kFlatEps * 0.5f; }
    if (mx.y - mn.y < kFlatEps) { mn.y -= kFlatEps * 0.5f; mx.y += kFlatEps * 0.5f; }
    if (mx.z - mn.z < kFlatEps) { mn.z -= kFlatEps * 0.5f; mx.z += kFlatEps * 0.5f; }
    int node = (int)bmin.size();
    bmin.push_back(mn);
    bmax.push_back(mx);
    left.push_back(-1);
    right.push_back(-1);
    offset.push_back(start);
    count.push_back(end - start);
    return node;
  }

  void centroid_bounds(int start, int end, F3& cmn, F3& cmx) const {
    cmn = cmx = cent[indices[start]];
    for (int i = start + 1; i < end; ++i) {
      const F3& c = cent[indices[i]];
      cmn = {std::min(cmn.x, c.x), std::min(cmn.y, c.y), std::min(cmn.z, c.z)};
      cmx = {std::max(cmx.x, c.x), std::max(cmx.y, c.y), std::max(cmx.z, c.z)};
    }
  }

  float axis_of(const F3& c, int axis) const {
    return axis == 0 ? c.x : (axis == 1 ? c.y : c.z);
  }

  int build_median(int start, int end) {
    int node = emit_node(start, end);
    int cnt = end - start;
    if (cnt <= kMaxLeaf) return node;

    F3 cmn, cmx;
    centroid_bounds(start, end, cmn, cmx);
    float dx = cmx.x - cmn.x, dy = cmx.y - cmn.y, dz = cmx.z - cmn.z;
    // reference tie-breaking (builder.cpp:404-406)
    int axis = 0;
    if (dy > dx && dy >= dz) axis = 1;
    else if (dz > dx && dz >= dy) axis = 2;
    float ext = axis == 0 ? dx : (axis == 1 ? dy : dz);
    if (ext == 0.0f) return node;  // degenerate -> leaf

    int mid = (start + end) / 2;
    std::nth_element(indices.begin() + start, indices.begin() + mid,
                     indices.begin() + end, [&](int a, int b) {
                       return axis_of(cent[a], axis) < axis_of(cent[b], axis);
                     });
    offset[node] = 0;
    count[node] = 0;
    int l = build_median(start, mid);
    int r = build_median(mid, end);
    left[node] = l;
    right[node] = r;
    return node;
  }

  static float surface(const F3& mn, const F3& mx) {
    float dx = std::max(mx.x - mn.x, 0.f);
    float dy = std::max(mx.y - mn.y, 0.f);
    float dz = std::max(mx.z - mn.z, 0.f);
    return 2.f * (dx * dy + dy * dz + dz * dx);
  }

  int build_sah(int start, int end, int depth) {
    int node = emit_node(start, end);
    int cnt = end - start;
    if (cnt <= kMaxLeaf) return node;

    F3 cmn, cmx;
    centroid_bounds(start, end, cmn, cmx);
    float d[3] = {cmx.x - cmn.x, cmx.y - cmn.y, cmx.z - cmn.z};
    int axis = 0;
    if (d[1] > d[axis]) axis = 1;
    if (d[2] > d[axis]) axis = 2;
    if (d[axis] <= 0.f) return node;

    int mid = -1;
    if (depth < kSahDepthCap) {
      float cmin = axis_of(cmn, axis);
      float inv = (float)kSahBins / d[axis];
      F3 bin_lo[kSahBins], bin_hi[kSahBins];
      int64_t bin_n[kSahBins] = {0};
      for (int b = 0; b < kSahBins; ++b) {
        bin_lo[b] = {1e30f, 1e30f, 1e30f};
        bin_hi[b] = {-1e30f, -1e30f, -1e30f};
      }
      auto bin_of = [&](int tri) {
        int b = (int)((axis_of(cent[tri], axis) - cmin) * inv);
        return std::min(b, kSahBins - 1);
      };
      for (int i = start; i < end; ++i) {
        int t = indices[i];
        int b = bin_of(t);
        const F3& a = lo[t];
        const F3& h = hi[t];
        bin_lo[b] = {std::min(bin_lo[b].x, a.x), std::min(bin_lo[b].y, a.y),
                     std::min(bin_lo[b].z, a.z)};
        bin_hi[b] = {std::max(bin_hi[b].x, h.x), std::max(bin_hi[b].y, h.y),
                     std::max(bin_hi[b].z, h.z)};
        bin_n[b]++;
      }
      F3 suf_lo[kSahBins], suf_hi[kSahBins];
      int64_t suf_n[kSahBins];
      F3 run_lo = bin_lo[kSahBins - 1], run_hi = bin_hi[kSahBins - 1];
      int64_t run_n = bin_n[kSahBins - 1];
      for (int b = kSahBins - 1; b >= 0; --b) {
        if (b < kSahBins - 1) {
          run_lo = {std::min(run_lo.x, bin_lo[b].x), std::min(run_lo.y, bin_lo[b].y),
                    std::min(run_lo.z, bin_lo[b].z)};
          run_hi = {std::max(run_hi.x, bin_hi[b].x), std::max(run_hi.y, bin_hi[b].y),
                    std::max(run_hi.z, bin_hi[b].z)};
          run_n += bin_n[b];
        }
        suf_lo[b] = run_lo;
        suf_hi[b] = run_hi;
        suf_n[b] = run_n;
      }
      float best_cost = 1e38f;
      int best_split = -1;
      F3 pre_lo = bin_lo[0], pre_hi = bin_hi[0];
      int64_t pre_n = bin_n[0];
      for (int s = 0; s < kSahBins - 1; ++s) {
        if (s > 0) {
          pre_lo = {std::min(pre_lo.x, bin_lo[s].x), std::min(pre_lo.y, bin_lo[s].y),
                    std::min(pre_lo.z, bin_lo[s].z)};
          pre_hi = {std::max(pre_hi.x, bin_hi[s].x), std::max(pre_hi.y, bin_hi[s].y),
                    std::max(pre_hi.z, bin_hi[s].z)};
          pre_n += bin_n[s];
        }
        if (pre_n == 0 || suf_n[s + 1] == 0) continue;
        float cost = surface(pre_lo, pre_hi) * pre_n
                     + surface(suf_lo[s + 1], suf_hi[s + 1]) * suf_n[s + 1];
        if (cost < best_cost) {
          best_cost = cost;
          best_split = s;
        }
      }
      float leaf_cost = surface(bmin[node], bmax[node]) * cnt;
      if (best_split >= 0
          && !(cnt <= 2 * kMaxLeaf && best_cost >= leaf_cost)) {
        auto it = std::partition(indices.begin() + start, indices.begin() + end,
                                 [&](int t) { return bin_of(t) <= best_split; });
        mid = (int)(it - indices.begin());
        if (mid == start || mid == end) mid = -1;  // safety: force median
      }
    }
    if (mid < 0) {
      mid = (start + end) / 2;
      std::nth_element(indices.begin() + start, indices.begin() + mid,
                       indices.begin() + end, [&](int a, int b) {
                         return axis_of(cent[a], axis) < axis_of(cent[b], axis);
                       });
    }
    offset[node] = 0;
    count[node] = 0;
    int l = build_sah(start, mid, depth + 1);
    int r = build_sah(mid, end, depth + 1);
    left[node] = l;
    right[node] = r;
    return node;
  }
};

}  // namespace

extern "C" int dsrt_build_bvh(const float* v0, const float* v1,
                              const float* v2, int n, int method,
                              float* out_bmin, float* out_bmax,
                              int32_t* out_left, int32_t* out_right,
                              int32_t* out_offset, int32_t* out_count,
                              int32_t* out_indices) {
  if (n <= 0) return 0;
  Builder b;
  b.v0 = v0;
  b.v1 = v1;
  b.v2 = v2;
  b.n = n;
  b.prepare();
  b.bmin.reserve(2 * n);
  b.bmax.reserve(2 * n);
  b.left.reserve(2 * n);
  b.right.reserve(2 * n);
  b.offset.reserve(2 * n);
  b.count.reserve(2 * n);

  if (method == 1)
    b.build_sah(0, n, 0);
  else
    b.build_median(0, n);

  int n_nodes = (int)b.bmin.size();
  if (n_nodes > 2 * n) return -1;  // caller allocated 2n capacity
  for (int i = 0; i < n_nodes; ++i) {
    out_bmin[3 * i] = b.bmin[i].x;
    out_bmin[3 * i + 1] = b.bmin[i].y;
    out_bmin[3 * i + 2] = b.bmin[i].z;
    out_bmax[3 * i] = b.bmax[i].x;
    out_bmax[3 * i + 1] = b.bmax[i].y;
    out_bmax[3 * i + 2] = b.bmax[i].z;
    out_left[i] = b.left[i];
    out_right[i] = b.right[i];
    out_offset[i] = b.offset[i];
    out_count[i] = b.count[i];
  }
  std::copy(b.indices.begin(), b.indices.end(), out_indices);
  return n_nodes;
}
