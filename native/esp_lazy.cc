// Lazy-greedy k-ESP+ selection core over the candidate Gram matrix.
//
// Host-side counterpart of mac_tpu/solvers/greedy_esp.py::subsets_lazy: the
// device computes G = A^T L_fixed^-1 A (batched CG + MXU matmuls); this
// C++ core runs the inherently-sequential lazy-greedy selection with a
// max-heap and per-candidate lazily-extended Cholesky columns of the
// Woodbury core M_S = W_S^-1 + G[S, S].
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

}  // namespace

extern "C" {

// G: (m, m) row-major Gram matrix; w: (m,) candidate weights;
// ks: (n_ks,) monotone budgets; out_order: (ks[n_ks-1],) selection order.
// Returns 0 on success, <0 on invalid input.
int esp_lazy_select(const double* G, const double* w, int64_t m,
                    const int64_t* ks, int64_t n_ks, int64_t* out_order) {
  if (m <= 0 || n_ks <= 0) return -1;
  const int64_t kmax = ks[n_ks - 1];
  if (kmax > m) return -2;

  // Lazily-extended columns U[:, e] (kmax rows max), stored column-major
  // per candidate, plus cached partial resistances.
  std::vector<double> Ucols(static_cast<size_t>(kmax) * m, 0.0);
  std::vector<int64_t> filled(m, 0);
  std::vector<double> qcache(m);
  std::vector<char> selected(m, 0);
  std::vector<int64_t> piv;
  std::vector<double> inv_sqrt_d;
  piv.reserve(kmax);
  inv_sqrt_d.reserve(kmax);

  for (int64_t e = 0; e < m; e++) qcache[e] = G[e * m + e];

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
      const double u = (G[p * m + e] - dot) * inv_sqrt_d[s];
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
      const double slack = 1e-13 * (std::fabs(fresh) > 1.0 ? std::fabs(fresh) : 1.0);
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

}  // extern "C"
