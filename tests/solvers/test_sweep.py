"""Vmapped budget-sweep API: one batched program per sweep, matching
per-budget solves."""

import networkx as nx
import numpy as np
import pytest

from mac_tpu.solvers import MAC
from mac_tpu.utils.conversions import nx_to_mac


@pytest.fixture(scope="module")
def problem():
    graph = nx.petersen_graph()
    tree = nx.minimum_spanning_tree(graph)
    loops = nx.difference(graph, tree)
    return nx_to_mac(tree), nx_to_mac(loops), graph.number_of_nodes()


def test_sweep_matches_individual_solves(problem):
    fixed, cands, n = problem
    mac = MAC(fixed, cands, n)
    ks = [1, 2, 3, 4]
    rounded, unrounded, upper = mac.solve_sweep(ks, max_iters=50)
    assert rounded.shape == (4, len(cands))
    for i, k in enumerate(ks):
        assert rounded[i].sum() == k
        r_i, u_i, b_i = mac.solve(
            k, np.full(len(cands), k / len(cands)), max_iters=50
        )
        assert np.isclose(
            mac.evaluate_objective(unrounded[i]),
            mac.evaluate_objective(u_i),
            rtol=1e-8,
        )
        assert np.isclose(upper[i], b_i, rtol=1e-8)


def test_sweep_k_exceeding_m(problem):
    fixed, cands, n = problem
    mac = MAC(fixed, cands, n)
    m = len(cands)
    rounded, unrounded, upper = mac.solve_sweep([2, m + 5], max_iters=20)
    np.testing.assert_allclose(rounded[1], np.ones(m))
    assert rounded[0].sum() == 2


def test_sweep_madow(problem):
    fixed, cands, n = problem
    mac = MAC(fixed, cands, n)
    rounded, _, _ = mac.solve_sweep([2, 3], rounding="madow", max_iters=30)
    assert rounded[0].sum() == 2
    assert rounded[1].sum() == 3


def test_sweep_with_warm_inner_schedule(problem):
    """The warm inner-CG schedule threads into the vmapped dynamic-k path:
    Petersen budgets converge to the same objectives (small graphs finish
    well inside any sane inner budget)."""
    fixed, cands, n = problem
    mac = MAC(fixed, cands, n, fiedler_warm_inner_iters=((1, 8), (5, 6)))
    ks = [2, 3]
    rounded, unrounded, upper = mac.solve_sweep(ks, max_iters=30)
    mac0 = MAC(fixed, cands, n)
    _, unrounded0, upper0 = mac0.solve_sweep(ks, max_iters=30)
    for i in range(len(ks)):
        assert np.isclose(
            mac.evaluate_objective(unrounded[i]),
            mac0.evaluate_objective(unrounded0[i]),
            rtol=1e-6,
        )
