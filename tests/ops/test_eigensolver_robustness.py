"""Eigensolver robustness: no NaNs when iterated far past convergence
(vmapped batch evaluation runs every lane to the last lane's iteration
count, so post-convergence iterations must stay finite)."""

import networkx as nx
import numpy as np

import jax.numpy as jnp

from mac_tpu.ops.laplacian import build_operator, lap_apply, lap_inf_norm, lap_tridiagonal_part
from mac_tpu.ops.lobpcg import tracemin_fiedler
from mac_tpu.ops.tridiag import tridiag_ldl, tridiag_solve_factored
from mac_tpu.utils.conversions import nx_to_mac
from mac_tpu.utils.fiedler import default_block
from mac_tpu.utils.graphs import edges_to_arrays, weight_graph_lap_from_edge_list


def test_tracemin_no_nan_past_convergence():
    rng = np.random.RandomState(0)
    n = 120
    G = nx.path_graph(n)
    while G.number_of_edges() < n - 1 + 30:
        i, j = rng.randint(0, n, 2)
        if abs(int(i) - int(j)) > 1:
            G.add_edge(int(i), int(j))
    for i, j in G.edges():
        G[i][j]["weight"] = 0.5 + rng.rand()
    edges = nx_to_mac(G)
    idx, w = edges_to_arrays(edges)
    op = build_operator(idx, n, mode="ell")
    w = jnp.asarray(w)

    apply_L = lambda V: lap_apply(op, w, V)
    lnorm = lap_inf_norm(op, w)
    d, e = tridiag_parts = lap_tridiagonal_part(op, w)
    fac = tridiag_ldl(d + 100 * jnp.finfo(w.dtype).eps * jnp.max(d), e)

    def center(B):
        return B - jnp.mean(B, axis=0, keepdims=True)

    Minv = lambda B: center(tridiag_solve_factored(fac, center(B)))

    X0 = jnp.asarray(default_block(n))
    # Run far past convergence with stall detection disabled and an
    # unreachable tolerance: every iterate must remain finite.
    res = tracemin_fiedler(
        apply_L, X0, lnorm, Minv, tol=0.0, maxiter=80,
        inner_iters=12, stall_patience=10**6,
    )
    assert np.isfinite(np.asarray(res.X)).all()
    assert np.isfinite(np.asarray(res.lam)).all()
    L = weight_graph_lap_from_edge_list(edges, n)
    import scipy.sparse.linalg as spla

    vals = spla.eigsh(L.astype(np.float64), k=2, sigma=-1e-4, which="LM",
                      return_eigenvectors=False)
    assert np.isclose(float(res.lam[0]), float(np.sort(vals)[-1]), rtol=1e-9)
