// Lazy-greedy k-ESP+ selection core.
//
// Host-side counterpart of mac_tpu/solvers/greedy_esp.py::subsets_lazy: the
// device computes Z = L_fixed^-1 A (batched direct/CG solves); this C++
// core runs the inherently-sequential lazy-greedy selection with a max-heap
// and per-candidate lazily-extended Cholesky columns of the Woodbury core
// M_S = W_S^-1 + G[S, S], where Gram entries are produced ON DEMAND from Z:
//
//     G[p, e] = a_p^T z_e = Z[u_p, e] - Z[v_p, e]
//
// so the (m, m) Gram matrix (0.9 GB at city10000) is never materialized —
// memory is O(n*m) for Z plus O(kmax*m) for the lazily-touched columns.
//
// (The reference's equivalent inner loop drives CHOLMOD rank-1 updates from
// Python, reference mac/solvers/greedy_esp.py:183-268.)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>

namespace {

struct HeapItem {
  double score;
  int64_t idx;
  bool operator<(const HeapItem& o) const { return score < o.score; }
};

// Shared selection loop. GramRow(p) must return a pointer-like accessor:
// we pass a lambda `gram(p, e)` producing G[p, e] in double.
template <typename GramFn>
int lazy_select_impl(GramFn gram, const double* w, int64_t m,
                     const int64_t* ks, int64_t n_ks, int64_t* out_order) {
  if (m <= 0 || n_ks <= 0) return -1;
  const int64_t kmax = ks[n_ks - 1];
  if (kmax > m) return -2;

  std::vector<double> Ucols(static_cast<size_t>(kmax) * m, 0.0);
  std::vector<int64_t> filled(m, 0);
  std::vector<double> qcache(m);
  std::vector<char> selected(m, 0);
  std::vector<int64_t> piv;
  std::vector<double> inv_sqrt_d;
  piv.reserve(kmax);
  inv_sqrt_d.reserve(kmax);

  for (int64_t e = 0; e < m; e++) qcache[e] = gram(e, e);

  std::priority_queue<HeapItem> pq;
  for (int64_t e = 0; e < m; e++) pq.push({w[e] * qcache[e], e});

  auto refresh = [&](int64_t e) -> double {
    const int64_t t = static_cast<int64_t>(piv.size());
    double* col_e = &Ucols[static_cast<size_t>(e) * kmax];
    for (int64_t s = filled[e]; s < t; s++) {
      const int64_t p = piv[s];
      const double* col_p = &Ucols[static_cast<size_t>(p) * kmax];
      double dot = 0.0;
      for (int64_t r = 0; r < s; r++) dot += col_p[r] * col_e[r];
      const double u = (gram(p, e) - dot) * inv_sqrt_d[s];
      col_e[s] = u;
      qcache[e] -= u * u;
    }
    filled[e] = t;
    return qcache[e];
  };

  int64_t n_sel = 0;
  while (n_sel < kmax) {
    int64_t p = -1;
    while (true) {
      if (pq.empty()) return -3;
      HeapItem top = pq.top();
      pq.pop();
      if (selected[top.idx]) continue;
      const double fresh = w[top.idx] * refresh(top.idx);
      const double slack =
          1e-13 * (std::fabs(fresh) > 1.0 ? std::fabs(fresh) : 1.0);
      if (fresh >= top.score - slack) {
        p = top.idx;
        break;
      }
      pq.push({fresh, top.idx});
    }
    const double denom = 1.0 / w[p] + qcache[p];
    piv.push_back(p);
    inv_sqrt_d.push_back(1.0 / std::sqrt(denom));
    selected[p] = 1;
    out_order[n_sel++] = p;
  }
  return 0;
}

// On-demand Gram entries from the solve matrix Z (n, m) row-major:
// G[p, e] = Z[u_p, e] - Z[v_p, e].
template <typename T>
int lazy_select_z_impl(const T* Z, const int64_t* u, const int64_t* v,
                       const double* w, int64_t m,
                       const int64_t* ks, int64_t n_ks, int64_t* out_order) {
  auto gram = [Z, u, v, m](int64_t p, int64_t e) -> double {
    return static_cast<double>(Z[u[p] * m + e]) -
           static_cast<double>(Z[v[p] * m + e]);
  };
  return lazy_select_impl(gram, w, m, ks, n_ks, out_order);
}

}  // namespace

extern "C" {

// Chain closed-form variant: when the fixed graph is a weighted path,
// a_p^T L_fixed^-1 a_e is the cumulative resistance of the OVERLAP of the
// two candidate intervals:
//     G[p, e] = max(0, rcum[min(hi_p, hi_e)] - rcum[max(lo_p, lo_e)]),
// rcum[k] = sum_{i<k} 1/w_chain[i]. No solves, no Z — O(n) memory.
int esp_lazy_select_chain(const double* rcum, const int64_t* lo,
                          const int64_t* hi, const double* w, int64_t m,
                          const int64_t* ks, int64_t n_ks,
                          int64_t* out_order) {
  auto gram = [rcum, lo, hi](int64_t p, int64_t e) -> double {
    const int64_t a = lo[p] > lo[e] ? lo[p] : lo[e];
    const int64_t b = hi[p] < hi[e] ? hi[p] : hi[e];
    const double ov = rcum[b] - rcum[a];
    return ov > 0.0 ? ov : 0.0;
  };
  return lazy_select_impl(gram, w, m, ks, n_ks, out_order);
}

// Z-based variants: never materialize the Gram matrix.
int esp_lazy_select_zd(const double* Z, const int64_t* u, const int64_t* v,
                       const double* w, int64_t m,
                       const int64_t* ks, int64_t n_ks, int64_t* out_order) {
  return lazy_select_z_impl(Z, u, v, w, m, ks, n_ks, out_order);
}

int esp_lazy_select_zf(const float* Z, const int64_t* u, const int64_t* v,
                       const double* w, int64_t m,
                       const int64_t* ks, int64_t n_ks, int64_t* out_order) {
  return lazy_select_z_impl(Z, u, v, w, m, ks, n_ks, out_order);
}

// Legacy pre-materialized Gram variant. G: (m, m) row-major; w: (m,)
// candidate weights; ks: (n_ks,) monotone budgets; out_order:
// (ks[n_ks-1],) selection order. Returns 0 on success, <0 on bad input.
int esp_lazy_select(const double* G, const double* w, int64_t m,
                    const int64_t* ks, int64_t n_ks, int64_t* out_order) {
  auto gram = [G, m](int64_t p, int64_t e) -> double { return G[p * m + e]; };
  return lazy_select_impl(gram, w, m, ks, n_ks, out_order);
}

}  // extern "C"
