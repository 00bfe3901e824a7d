"""Fiedler oracle tests: analytic spectra, scipy differential parity, the
ELL + LOBPCG iterative path, and disconnected graphs — the reference's
known-unsupported case (reference tests/utils/test_fiedler.py:43-50,
skipped there; supported here).

Small graphs hit the exact dense-eigh path; one medium graph exercises the
full iterative stack (ELL operator, tridiagonal preconditioner, inner CG,
LOBPCG) — kept to a single compile, since XLA-CPU compilation dominates
wall-clock in CI.
"""

import networkx as nx
import numpy as np
import pytest
import scipy.sparse.linalg as spla

import jax.numpy as jnp

from mac_tpu.ops.laplacian import build_operator
from mac_tpu.utils.conversions import nx_to_mac
from mac_tpu.utils.fiedler import default_block, fiedler_pair_op, find_fiedler_pair
from mac_tpu.utils.graphs import edges_to_arrays, weight_graph_lap_from_edge_list


def _scipy_lambda2(L):
    vals = spla.eigsh(L.astype(np.float64), k=2, sigma=-1e-4, which="LM",
                      return_eigenvectors=False)
    return float(np.sort(vals)[-1])


def test_complete_graph_analytic():
    # lambda_2(K_N) == N exactly.
    G = nx.complete_graph(5)
    L = weight_graph_lap_from_edge_list(nx_to_mac(G), 5)
    lam, v, X = find_fiedler_pair(L)
    assert np.isclose(float(lam), 5.0)
    assert X.shape == (5, 4)
    assert abs(float(np.sum(np.asarray(v)))) < 1e-8  # v orthogonal to ones


def test_petersen_analytic():
    # lambda_2 of the Petersen graph is exactly 2.
    G = nx.petersen_graph()
    L = weight_graph_lap_from_edge_list(nx_to_mac(G), 10)
    lam, v, _ = find_fiedler_pair(L)
    assert np.isclose(float(lam), 2.0)


def test_path_graph_analytic():
    # lambda_2(P_n) = 4 sin^2(pi/(2n)).
    n = 50
    G = nx.path_graph(n)
    L = weight_graph_lap_from_edge_list(nx_to_mac(G), n)
    lam, v, _ = find_fiedler_pair(L)
    expected = 4 * np.sin(np.pi / (2 * n)) ** 2
    assert np.isclose(float(lam), expected, rtol=1e-6)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_weighted_graph_vs_scipy(seed):
    rng = np.random.RandomState(seed)
    G = nx.erdos_renyi_graph(40, 0.2, seed=seed)
    for i in range(39):
        G.add_edge(i, i + 1)
    for i, j in G.edges():
        G[i][j]["weight"] = 0.1 + rng.rand()
    L = weight_graph_lap_from_edge_list(nx_to_mac(G), 40)
    lam, v, _ = find_fiedler_pair(L, tol=1e-10)
    expected = _scipy_lambda2(L)
    assert np.isclose(float(lam), expected, rtol=1e-8, atol=1e-10)
    v = np.asarray(v)
    r = L @ v - float(lam) * v
    assert np.linalg.norm(r) < 1e-6 * np.linalg.norm(L.toarray(), np.inf)


def test_warm_start_reuses_block():
    G = nx.petersen_graph()
    L = weight_graph_lap_from_edge_list(nx_to_mac(G), 10)
    lam1, _, X = find_fiedler_pair(L)
    lam2, _, _ = find_fiedler_pair(L, X=np.asarray(X))
    assert np.isclose(float(lam1), float(lam2))


def test_disconnected_graph_lambda2_zero():
    # Two disjoint K_3's: lambda_2 = 0. The reference skips this case
    # ("Feature not yet supported"); we support it.
    G = nx.complete_graph(3)
    G.add_edges_from((u, v) for u in range(3, 6) for v in range(u + 1, 6))
    L = weight_graph_lap_from_edge_list(nx_to_mac(G), 6)
    lam, v, _ = find_fiedler_pair(L)
    assert np.isclose(float(lam), 0.0, atol=1e-9)


def test_normalized_dense_vs_networkx():
    # Small n hits the exact dense path: lambda_2 of the NORMALIZED
    # Laplacian must match networkx. (The reference advertises
    # normalized=True but its branch is broken — cholesky.py:316.)
    rng = np.random.RandomState(3)
    G = nx.petersen_graph()
    for i, j in G.edges():
        G[i][j]["weight"] = 0.1 + rng.rand()
    L = weight_graph_lap_from_edge_list(nx_to_mac(G), 10)
    lam, v, X = find_fiedler_pair(L, normalized=True)
    N = nx.normalized_laplacian_matrix(G, nodelist=range(10)).toarray()
    expected = np.sort(np.linalg.eigvalsh((N + N.T) / 2))[1]
    assert np.isclose(float(lam), expected, rtol=1e-10)
    # Eigenvector is orthogonal to the D^{1/2}1 nullvec, not to 1.
    sqd = np.sqrt(L.diagonal())
    assert abs(float(sqd @ np.asarray(v))) < 1e-8


def test_normalized_iterative_vs_scipy():
    # n > DENSE_EIGH_MAX_N forces the matrix-free similarity-transformed
    # TRACEMIN path with the generalized nullvec.
    rng = np.random.RandomState(11)
    n = 300
    G = nx.path_graph(n)
    while G.number_of_edges() < n - 1 + 50:
        i, j = rng.randint(0, n, 2)
        if abs(int(i) - int(j)) > 1:
            G.add_edge(int(i), int(j))
    for i, j in G.edges():
        G[i][j]["weight"] = 0.5 + rng.rand()
    L = weight_graph_lap_from_edge_list(nx_to_mac(G), n)
    lam, v, _ = find_fiedler_pair(L, normalized=True, tol=1e-10)
    d = np.asarray(L.diagonal())
    s = 1.0 / np.sqrt(d)
    Nd = s[:, None] * L.toarray() * s[None, :]
    expected = np.sort(np.linalg.eigvalsh((Nd + Nd.T) / 2))[1]
    assert np.isclose(float(lam), expected, rtol=1e-7)
    v = np.asarray(v)
    r = Nd @ v - float(lam) * v
    assert np.linalg.norm(r) < 1e-6


def test_normalized_parity_wrapper():
    # tracemin_fiedler_cholesky(normalized=True) works end-to-end
    # (reference-name surface; the reference's own branch raises NameError).
    from mac_tpu.utils.fiedler import tracemin_fiedler_cholesky

    G = nx.complete_graph(6)
    L = weight_graph_lap_from_edge_list(nx_to_mac(G), 6)
    sigma, XT = tracemin_fiedler_cholesky(L, normalized=True)
    # K_n normalized Laplacian: lambda_2 = n/(n-1).
    assert np.isclose(sigma[0], 6.0 / 5.0, rtol=1e-10)
    assert XT.shape[1] == 6


def test_normalized_isolated_node_raises():
    G = nx.complete_graph(4)
    L = weight_graph_lap_from_edge_list(nx_to_mac(G), 5)  # node 4 isolated
    with pytest.raises(ValueError):
        find_fiedler_pair(L, normalized=True)


def test_iterative_ell_path_vs_scipy_and_warm_start():
    # Path + random loop closures, forced onto the ELL + LOBPCG path
    # (auto mode would pick dense at this size). One compile, three checks:
    # scipy parity, warm-start immediate convergence, residual criterion.
    rng = np.random.RandomState(42)
    n = 400
    G = nx.path_graph(n)
    while G.number_of_edges() < n - 1 + 60:
        i, j = rng.randint(0, n, 2)
        if abs(int(i) - int(j)) > 1:
            G.add_edge(int(i), int(j))
    for i, j in G.edges():
        G[i][j]["weight"] = 0.5 + rng.rand()
    edges = nx_to_mac(G)
    idx, w = edges_to_arrays(edges)
    op = build_operator(idx, n, mode="ell")
    assert op.mode == "ell"
    X0 = jnp.asarray(default_block(n))
    res = fiedler_pair_op(op, jnp.asarray(w), X0, tol=1e-9, maxiter=100)

    L = weight_graph_lap_from_edge_list(edges, n)
    expected = _scipy_lambda2(L)
    assert np.isclose(float(res.lam[0]), expected, rtol=1e-8, atol=1e-12)
    assert int(res.iters) < 60  # preconditioner keeps outer iterations low

    # Warm start from the converged block: terminates (near-)immediately.
    res2 = fiedler_pair_op(op, jnp.asarray(w), res.X, tol=1e-9, maxiter=100)
    assert int(res2.iters) <= 2
    assert np.isclose(float(res2.lam[0]), expected, rtol=1e-8)
