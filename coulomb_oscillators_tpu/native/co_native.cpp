// Native runtime components: exact kd-tree build + dual-tree traversal.
//
// TPU-native replacement for the reference's vendored native libraries
// (bb_segsort GPU segmented sort, parasort CPU sample-sort — SURVEY.md §2.6)
// and the persistent-kernel dual traversal (fmm_cart3_kdtree.cuh:416-567).
// The device compute path stays in XLA; these host routines run at
// tree-rebuild time only (amortized over tree_steps integrator steps).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libco_native.so co_native.cpp
// C ABI, loaded via ctypes (no pybind11 in this image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Equal-count kd-tree build.
//
// pos:  [n*dim] float32 (row-major points)
// perm: [n] int32, preloaded with 0..n-1; on return, sorted slot -> original
//       particle index such that node i at level l covers slots
//       [n*i/2^l, n*(i+1)/2^l).
// Splits each node along its widest axis with std::nth_element (O(N) per
// level, no full sort — the host analogue of the reference's per-level
// bb_segsort passes, cheaper by a log factor).
// ---------------------------------------------------------------------------
void co_kdtree_build(const float* pos, int32_t* perm, int64_t n, int32_t L,
                     int32_t dim) {
  std::vector<int64_t> beg((size_t(1) << L) + 1);
  for (int32_t l = 0; l < L; ++l) {
    int64_t m = int64_t(1) << l;
    for (int64_t i = 0; i <= m; ++i) beg[i] = (n * i) / m;
    for (int64_t i = 0; i < m; ++i) {
      int64_t lo = beg[i], hi = beg[i + 1];
      if (hi - lo < 2) continue;
      // widest axis of this node's particles
      float mn[3] = {1e30f, 1e30f, 1e30f};
      float mx[3] = {-1e30f, -1e30f, -1e30f};
      for (int64_t k = lo; k < hi; ++k) {
        const float* p = pos + int64_t(perm[k]) * dim;
        for (int32_t a = 0; a < dim; ++a) {
          mn[a] = std::min(mn[a], p[a]);
          mx[a] = std::max(mx[a], p[a]);
        }
      }
      int32_t axis = 0;
      float w = mx[0] - mn[0];
      for (int32_t a = 1; a < dim; ++a)
        if (mx[a] - mn[a] > w) { w = mx[a] - mn[a]; axis = a; }
      int64_t mid = (n * (2 * i + 1)) / (2 * m);  // left child's end
      std::nth_element(perm + lo, perm + mid, perm + hi,
                       [&](int32_t a, int32_t b) {
                         return pos[int64_t(a) * dim + axis] <
                                pos[int64_t(b) * dim + axis];
                       });
    }
  }
}

// ---------------------------------------------------------------------------
// Dual-tree MAC traversal (kd_admissible semantics,
// fmm_cart3_kdtree.cuh:395-414): admissible iff
// (radius*Mf)^2 * max(diag2_a, diag2_b) < dist2,  Mf=(max(mult)/n)^(1/(3p+6)).
//
// Heap arrays over all 2^(L+1)-1 nodes.  Writes up to cap entries into
// m2l_out / p2p_out as (i, j) int32 pairs (unordered, i<=j; self pairs only
// in p2p).  Returns 0 on success; counts written via out params.  If a list
// overflows, keeps counting (so the caller can re-alloc) but stops writing.
// ---------------------------------------------------------------------------
int32_t co_traverse(const float* center, const float* lb, const float* rb,
                    const int32_t* mult, int32_t L, int64_t n, int32_t dim,
                    int32_t p, float radius, int32_t* m2l_out,
                    int64_t m2l_cap, int64_t* m2l_count, int32_t* p2p_out,
                    int64_t p2p_cap, int64_t* p2p_count) {
  const int64_t leaf0 = (int64_t(1) << L) - 1;
  const int64_t M = (int64_t(1) << (L + 1)) - 1;
  std::vector<float> sz(M);
  for (int64_t i = 0; i < M; ++i) {
    float s = 0;
    for (int32_t a = 0; a < dim; ++a) {
      float d = rb[i * dim + a] - lb[i * dim + a];
      s += d * d;
    }
    sz[i] = s;
  }
  const float expo = 1.0f / float(3 * p + 6);
  // (radius * Mf)^2 per node: Mf = (mult/n)^expo is monotone in mult, so
  // the pair value (radius*(max mult)^expo)^2 = max of the two node values.
  // Precomputing it hoists std::pow out of the traversal hot loop (the pow
  // dominated at deep refinements: millions of visited pairs).
  std::vector<float> pm2(M);
  for (int64_t i = 0; i < M; ++i) {
    float Mf = std::pow(float(mult[i]) / float(n), expo);
    pm2[i] = (radius * Mf) * (radius * Mf);
  }
  int64_t nm = 0, np_ = 0;
  std::vector<std::pair<int64_t, int64_t>> stack;
  stack.reserve(4096);
  stack.emplace_back(0, 0);
  while (!stack.empty()) {
    auto [i, j] = stack.back();
    stack.pop_back();
    if (i != j) {
      float dist2 = 0;
      for (int32_t a = 0; a < dim; ++a) {
        float d = center[i * dim + a] - center[j * dim + a];
        dist2 += d * d;
      }
      if (std::max(pm2[i], pm2[j]) * std::max(sz[i], sz[j]) < dist2) {
        if (nm < m2l_cap) {
          m2l_out[2 * nm] = int32_t(i);
          m2l_out[2 * nm + 1] = int32_t(j);
        }
        ++nm;
        continue;
      }
    }
    bool leaf_i = i >= leaf0, leaf_j = j >= leaf0;
    if (leaf_i && leaf_j) {
      if (np_ < p2p_cap) {
        p2p_out[2 * np_] = int32_t(i - leaf0);
        p2p_out[2 * np_ + 1] = int32_t(j - leaf0);
      }
      ++np_;
      continue;
    }
    if (i == j) {
      int64_t l = 2 * i + 1, r = 2 * i + 2;
      stack.emplace_back(l, l);
      stack.emplace_back(l, r);
      stack.emplace_back(r, r);
    } else if (!leaf_i && (leaf_j || sz[i] >= sz[j])) {
      stack.emplace_back(2 * i + 1, j);
      stack.emplace_back(2 * i + 2, j);
    } else {
      stack.emplace_back(i, 2 * j + 1);
      stack.emplace_back(i, 2 * j + 2);
    }
  }
  *m2l_count = nm;
  *p2p_count = np_;
  return (nm <= m2l_cap && np_ <= p2p_cap) ? 0 : 1;
}

// Node geometry from a sorted particle array (host fallback/check).
// pos_s: [n*dim] sorted; fills center/lb/rb ([M*dim]) and lam [M].
void co_node_geometry(const float* pos_s, int64_t n, int32_t L, int32_t dim,
                      float* center, float* lb, float* rb, float* lam) {
  for (int32_t l = 0; l <= L; ++l) {
    int64_t m = int64_t(1) << l;
    int64_t off = m - 1;
    for (int64_t i = 0; i < m; ++i) {
      int64_t lo = (n * i) / m, hi = (n * (i + 1)) / m;
      float mn[3] = {1e30f, 1e30f, 1e30f};
      float mx[3] = {-1e30f, -1e30f, -1e30f};
      double sum[3] = {0, 0, 0};
      for (int64_t k = lo; k < hi; ++k)
        for (int32_t a = 0; a < dim; ++a) {
          float v = pos_s[k * dim + a];
          mn[a] = std::min(mn[a], v);
          mx[a] = std::max(mx[a], v);
          sum[a] += v;
        }
      float diag2 = 0;
      for (int32_t a = 0; a < dim; ++a) {
        center[(off + i) * dim + a] = float(sum[a] / std::max<int64_t>(hi - lo, 1));
        lb[(off + i) * dim + a] = mn[a];
        rb[(off + i) * dim + a] = mx[a];
        float d = mx[a] - mn[a];
        diag2 += d * d;
      }
      lam[off + i] = std::max(0.5f * std::sqrt(diag2), 1e-30f);
    }
  }
}

}  // extern "C"
