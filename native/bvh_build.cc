// Native BVH builder: binned-SAH construction of the flattened skip-link
// layout consumed by the device traversal kernel (jet_pbrt_tpu/ops/bvh.py).
//
// The reference builds its BVH by sorting on a *random* axis and splitting
// at the median (reference: src/bvh.h:59-92). This builder upgrades that to
// a 16-bin surface-area-heuristic split (falling back to the median when SAH
// finds no useful partition) while emitting byte-identical array semantics
// to the numpy builder so either can feed the traversal kernel:
//   * nodes in DFS preorder, `miss` skip links, inner leaf_first = -1
//   * leaves padded to exactly leaf_size triangle slots via `order`
//     (duplicating the leaf's last real triangle).
//
// Build: make -C native

#include <algorithm>
#include <cfloat>
#include <cstring>
#include <vector>

namespace {

struct V3 {
  float x, y, z;
};

static inline V3 vmin(V3 a, V3 b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
static inline V3 vmax(V3 a, V3 b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}
static inline float axis_of(V3 v, int a) {
  return a == 0 ? v.x : (a == 1 ? v.y : v.z);
}
static inline float surface(V3 lo, V3 hi) {
  float dx = std::max(0.f, hi.x - lo.x);
  float dy = std::max(0.f, hi.y - lo.y);
  float dz = std::max(0.f, hi.z - lo.z);
  return 2.f * (dx * dy + dy * dz + dz * dx);
}

struct BuildNode {
  V3 bmin, bmax;
  int left = -1, right = -1;
  int subtree = 1;
  std::vector<long long> prims;  // leaf only
};

struct Builder {
  std::vector<V3> tb_min, tb_max, centroid;
  std::vector<BuildNode> nodes;
  int leaf_size;
  bool use_sah;

  int build(std::vector<long long>& idx) {
    int row = (int)nodes.size();
    nodes.emplace_back();
    V3 lo = {FLT_MAX, FLT_MAX, FLT_MAX}, hi = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
    V3 clo = lo, chi = hi;
    for (long long i : idx) {
      lo = vmin(lo, tb_min[i]);
      hi = vmax(hi, tb_max[i]);
      clo = vmin(clo, centroid[i]);
      chi = vmax(chi, centroid[i]);
    }
    nodes[row].bmin = lo;
    nodes[row].bmax = hi;
    if ((int)idx.size() <= leaf_size) {
      nodes[row].prims = idx;
      return row;
    }

    // choose the widest centroid axis
    V3 ext = {chi.x - clo.x, chi.y - clo.y, chi.z - clo.z};
    int axis = 0;
    if (ext.y > axis_of(ext, axis)) axis = 1;
    if (ext.z > axis_of(ext, axis)) axis = 2;
    float cmin = axis_of(clo, axis), cmax = axis_of(chi, axis);

    std::vector<long long> li, ri;
    bool split_done = false;

    if (use_sah && cmax > cmin) {
      constexpr int kBins = 16;
      struct Bin {
        V3 lo = {FLT_MAX, FLT_MAX, FLT_MAX};
        V3 hi = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
        int n = 0;
      } bins[kBins];
      const float scale = kBins / (cmax - cmin);
      for (long long i : idx) {
        int b = std::min(kBins - 1,
                         (int)((axis_of(centroid[i], axis) - cmin) * scale));
        bins[b].lo = vmin(bins[b].lo, tb_min[i]);
        bins[b].hi = vmax(bins[b].hi, tb_max[i]);
        bins[b].n++;
      }
      float best_cost = FLT_MAX;
      int best_cut = -1;
      for (int cut = 1; cut < kBins; ++cut) {
        V3 llo = {FLT_MAX, FLT_MAX, FLT_MAX}, lhi = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
        V3 rlo = llo, rhi = lhi;
        int ln = 0, rn = 0;
        for (int b = 0; b < cut; ++b) {
          if (!bins[b].n) continue;
          llo = vmin(llo, bins[b].lo);
          lhi = vmax(lhi, bins[b].hi);
          ln += bins[b].n;
        }
        for (int b = cut; b < kBins; ++b) {
          if (!bins[b].n) continue;
          rlo = vmin(rlo, bins[b].lo);
          rhi = vmax(rhi, bins[b].hi);
          rn += bins[b].n;
        }
        if (!ln || !rn) continue;
        float cost = surface(llo, lhi) * ln + surface(rlo, rhi) * rn;
        if (cost < best_cost) {
          best_cost = cost;
          best_cut = cut;
        }
      }
      if (best_cut >= 0) {
        float cutpos = cmin + best_cut / scale;
        for (long long i : idx) {
          (axis_of(centroid[i], axis) < cutpos ? li : ri).push_back(i);
        }
        split_done = !li.empty() && !ri.empty();
        if (!split_done) {
          li.clear();
          ri.clear();
        }
      }
    }

    if (!split_done) {
      // median split (the reference's partition rule, deterministic axis)
      std::vector<long long> sorted = idx;
      std::stable_sort(sorted.begin(), sorted.end(),
                       [&](long long a, long long b) {
                         return axis_of(centroid[a], axis) <
                                axis_of(centroid[b], axis);
                       });
      size_t half = sorted.size() / 2;
      li.assign(sorted.begin(), sorted.begin() + half);
      ri.assign(sorted.begin() + half, sorted.end());
    }

    idx.clear();
    idx.shrink_to_fit();
    int l = build(li);
    int r = build(ri);
    nodes[row].left = l;
    nodes[row].right = r;
    nodes[row].subtree = 1 + nodes[l].subtree + nodes[r].subtree;
    return row;
  }
};

}  // namespace

extern "C" {

// Builds the flattened skip-link BVH. Caller allocates bmin/bmax[cap*3],
// miss/leaf_first/leaf_count[cap], order[cap_order] with cap >= 2*t+2 and
// cap_order >= 2*t + 4*leaf_count_upper (4*t is safe). Returns the node
// count, writes the padded-order length to *order_len; -1 on error.
long long jp_bvh_build(const float* p0, const float* p1, const float* p2,
                       long long t, int leaf_size, int use_sah, float* bmin,
                       float* bmax, int* miss, int* leaf_first,
                       int* leaf_count, long long* order,
                       long long* order_len) {
  if (t <= 0) return -1;
  Builder b;
  b.leaf_size = leaf_size;
  b.use_sah = use_sah != 0;
  b.tb_min.resize(t);
  b.tb_max.resize(t);
  b.centroid.resize(t);
  for (long long i = 0; i < t; ++i) {
    V3 a = {p0[i * 3], p0[i * 3 + 1], p0[i * 3 + 2]};
    V3 c = {p1[i * 3], p1[i * 3 + 1], p1[i * 3 + 2]};
    V3 d = {p2[i * 3], p2[i * 3 + 1], p2[i * 3 + 2]};
    V3 lo = vmin(vmin(a, c), d);
    V3 hi = vmax(vmax(a, c), d);
    // thin-box padding (reference: src/geometry.h:299-304)
    if (hi.x - lo.x < 1e-4f) { lo.x -= 1e-4f; hi.x += 1e-4f; }
    if (hi.y - lo.y < 1e-4f) { lo.y -= 1e-4f; hi.y += 1e-4f; }
    if (hi.z - lo.z < 1e-4f) { lo.z -= 1e-4f; hi.z += 1e-4f; }
    b.tb_min[i] = lo;
    b.tb_max[i] = hi;
    b.centroid[i] = {(lo.x + hi.x) * 0.5f, (lo.y + hi.y) * 0.5f,
                     (lo.z + hi.z) * 0.5f};
  }
  std::vector<long long> all(t);
  for (long long i = 0; i < t; ++i) all[i] = i;
  b.build(all);

  // DFS-preorder flatten with skip links (iterative; LIFO pushes right
  // first so the left child lands at i+1)
  const int n_nodes = b.nodes[0].subtree;
  long long emitted = 0, ocount = 0;
  std::vector<std::pair<int, int>> stack;  // (build row, skip target)
  stack.push_back({0, n_nodes});
  while (!stack.empty()) {
    auto [row, skip] = stack.back();
    stack.pop_back();
    const BuildNode& nd = b.nodes[row];
    long long i = emitted++;
    memcpy(bmin + i * 3, &nd.bmin, 3 * sizeof(float));
    memcpy(bmax + i * 3, &nd.bmax, 3 * sizeof(float));
    miss[i] = skip;
    if (nd.left < 0) {
      leaf_first[i] = (int)ocount;
      leaf_count[i] = (int)nd.prims.size();
      for (int k = 0; k < leaf_size; ++k) {
        size_t kk = std::min((size_t)k, nd.prims.size() - 1);
        order[ocount++] = nd.prims[kk];
      }
    } else {
      leaf_first[i] = -1;
      leaf_count[i] = 0;
      int right_start = (int)i + 1 + b.nodes[nd.left].subtree;
      stack.push_back({nd.right, skip});
      stack.push_back({nd.left, right_start});
    }
  }
  *order_len = ocount;
  return n_nodes;
}

}  // extern "C"
