"""Incremental Fiedler solver: add/remove edge semantics and warm-started
re-solve accuracy (role of reference mac/utils/cholesky.py:250-376)."""

import networkx as nx
import numpy as np
import pytest

from mac_tpu.utils.conversions import nx_to_mac
from mac_tpu.utils.fiedler import find_fiedler_pair
from mac_tpu.utils.graphs import Edge, weight_graph_lap_from_edge_list
from mac_tpu.utils.incremental import IncrementalFiedlerSolver


def test_add_remove_edge_matches_fresh_solves():
    rng = np.random.RandomState(0)
    n = 30
    G = nx.path_graph(n)
    for i, j in G.edges():
        G[i][j]["weight"] = 0.5 + rng.rand()
    base = nx_to_mac(G)
    cands = [Edge(2, 17, 1.3), Edge(5, 25, 0.7), Edge(0, 29, 2.0)]

    solver = IncrementalFiedlerSolver(base, n, candidate_edges=cands)
    lam0, v0 = solver.find_fiedler_pair()
    lam_ref0, _, _ = find_fiedler_pair(weight_graph_lap_from_edge_list(base, n))
    assert np.isclose(lam0, float(lam_ref0), rtol=1e-8)

    solver.add_edge(cands[0])
    lam1, _ = solver.find_fiedler_pair()
    lam_ref1, _, _ = find_fiedler_pair(
        weight_graph_lap_from_edge_list(base + [cands[0]], n)
    )
    assert np.isclose(lam1, float(lam_ref1), rtol=1e-8)
    assert lam1 >= lam0 - 1e-12  # adding an edge cannot decrease lambda_2

    solver.add_edge(cands[1])
    lam2, _ = solver.find_fiedler_pair()
    solver.remove_edge(cands[1])
    lam3, _ = solver.find_fiedler_pair()
    assert np.isclose(lam3, lam1, rtol=1e-7)
    assert lam2 >= lam3 - 1e-12


def test_undeclared_edge_rejected():
    base = [Edge(0, 1, 1.0), Edge(1, 2, 1.0)]
    solver = IncrementalFiedlerSolver(base, 3)
    with pytest.raises(KeyError):
        solver.add_edge(Edge(0, 2, 1.0))


def test_parallel_edge_multiplicity():
    base = [Edge(i, i + 1, 1.0) for i in range(9)]
    cand = Edge(0, 9, 1.0)
    solver = IncrementalFiedlerSolver(base, 10, candidate_edges=[cand, cand])
    solver.add_edge(cand)
    solver.add_edge(cand)  # second parallel copy
    lam, _ = solver.find_fiedler_pair()
    L = weight_graph_lap_from_edge_list(base + [cand, cand], 10)
    lam_ref, _, _ = find_fiedler_pair(L)
    assert np.isclose(lam, float(lam_ref), rtol=1e-8)
