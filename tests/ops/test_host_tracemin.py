"""Host f64 engine units: grounded block-PCG and the pruning splu factor
(mac_tpu.ops.host_tracemin). The engine itself is covered end-to-end by
tests/solvers/test_mac.py::test_host_backend_parity; these pin the round-5
additions."""

import numpy as np
import scipy.sparse as sp

from mac_tpu.ops.host_tracemin import (
    block_pcg,
    host_tracemin_fiedler,
    splu_reduced,
)
from mac_tpu.utils.graphs import weight_graph_lap_from_edges


def _chain_plus_loops(n=120, m=40, seed=0):
    rng = np.random.RandomState(seed)
    fixed = np.stack([np.arange(n - 1), np.arange(1, n)], 1)
    lo = rng.randint(0, n - 12, m)
    cand = np.stack([lo, lo + 2 + rng.randint(0, 9, m)], 1)
    idx = np.concatenate([fixed, cand])
    w = np.concatenate([0.5 + rng.rand(n - 1), 0.5 + rng.rand(m)])
    return idx, w, n


def test_block_pcg_matches_direct_solve():
    idx, w, n = _chain_plus_loops()
    L = weight_graph_lap_from_edges(idx, w, n)
    lu = splu_reduced(L)
    A = sp.csr_matrix(L.tocsr()[1:, 1:])
    B = np.random.RandomState(1).normal(size=(n - 1, 3))

    # Exact preconditioner: one iteration.
    Y, it, ok = block_pcg(A, B, lu.solve, tol=1e-12)
    assert ok and it <= 2
    assert np.allclose(A @ Y, B, atol=1e-9)

    # Stale (perturbed-weights) preconditioner: still converges, to the
    # solution of the CURRENT system.
    w2 = w * (1.0 + 0.3 * np.random.RandomState(2).rand(len(w)))
    A2 = sp.csr_matrix(
        weight_graph_lap_from_edges(idx, w2, n).tocsr()[1:, 1:])
    Y2, it2, ok2 = block_pcg(A2, B, lu.solve, tol=1e-11, maxiter=200)
    assert ok2
    assert np.allclose(A2 @ Y2, B, atol=1e-8)


def test_splu_reduced_prunes_explicit_zeros():
    """Fixed-pattern Laplacians carry structural zeros for unselected
    candidates; the factor must treat them as absent (pruned-parity
    solves, fewer nonzeros fed to SuperLU) and must not mutate the
    caller's shared pattern arrays."""
    idx, w, n = _chain_plus_loops()
    w_zeroed = w.copy()
    w_zeroed[n - 1 + np.arange(0, 30)] = 0.0  # de-select 30 candidates
    L_full = weight_graph_lap_from_edges(idx, w_zeroed, n).tocsr()
    # Force explicit zero slots (the incremental builder's shape).
    L_full.sort_indices()
    nnz_before = L_full.nnz
    indices_before = L_full.indices.copy()
    L_pruned = L_full.copy()
    L_pruned.eliminate_zeros()
    assert L_pruned.nnz < nnz_before  # the test is non-vacuous

    lu_full = splu_reduced(L_full)
    lu_pruned = splu_reduced(L_pruned)
    b = np.random.RandomState(3).normal(size=n - 1)
    assert np.allclose(lu_full.solve(b), lu_pruned.solve(b), atol=1e-9)
    assert np.array_equal(L_full.indices, indices_before)  # not mutated

    # And the eigensolve built on it still converges to the true pair.
    lam, X, _ = host_tracemin_fiedler(
        L_full, np.random.RandomState(4).normal(size=(n, 4)))
    from mac_tpu.utils.fiedler import scipy_lam2

    assert abs(lam[0] - scipy_lam2(L_pruned)) < 1e-8 * max(lam[0], 1e-30)


def test_host_pcg_optin_end_to_end():
    """MAC(host backend) with the host_pcg experiment knob produces the
    same objective as the exact-factor default (the operator is exact
    either way; only the inner solve is iterative)."""
    import jax.numpy as jnp  # noqa: F401

    from mac_tpu.solvers import MAC
    from mac_tpu.utils.graphs import Edge

    idx, w, n = _chain_plus_loops(n=200, m=60, seed=5)
    fixed = [Edge(int(i), int(j), float(ww))
             for (i, j), ww in zip(idx[: n - 1], w[: n - 1])]
    cands = [Edge(int(i), int(j), float(ww))
             for (i, j), ww in zip(idx[n - 1:], w[n - 1:])]
    k = len(cands) // 2

    mac = MAC(fixed, cands, n, fiedler_backend="host")
    _, u_exact, _ = mac.solve(k, max_iters=6, use_cache=True)
    mac.host_pcg = True
    _, u_pcg, _ = mac.solve(k, max_iters=6, use_cache=True)
    assert "host_pcg_iters" in mac.last_solve_stats
    f_exact = mac.evaluate_objective(u_exact)
    f_pcg = mac.evaluate_objective(u_pcg)
    assert abs(f_pcg - f_exact) <= 1e-6 * abs(f_exact)
