"""Warm-start cache A/B harness (role of the reference's pytest-benchmark
suite, tests/benchmarks/test_cache_performance.py — pytest-benchmark isn't
in this image, so this uses plain wall-clock with generous slack; the
assertion is equivalence of results, the timing is informational)."""

import time

import networkx as nx
import numpy as np

from mac_tpu.solvers import MAC
from mac_tpu.utils.conversions import nx_to_mac


def _setup():
    graph = nx.petersen_graph()
    tree = nx.minimum_spanning_tree(graph)
    loops = nx.difference(graph, tree)
    return nx_to_mac(tree), nx_to_mac(loops), graph.number_of_nodes()


def test_cache_on_off_agree_and_report_timing():
    fixed, cands, n = _setup()
    k = 5
    x_init = np.full(len(cands), k / len(cands))

    mac = MAC(fixed, cands, n)
    # Compile both variants.
    mac.solve(k, x_init, use_cache=True, max_iters=30)
    mac.solve(k, x_init, use_cache=False, max_iters=30)

    rounds = 5
    t0 = time.perf_counter()
    for _ in range(rounds):
        r_on, u_on, b_on = mac.solve(k, x_init, use_cache=True, max_iters=30)
    t_on = (time.perf_counter() - t0) / rounds

    t0 = time.perf_counter()
    for _ in range(rounds):
        r_off, u_off, b_off = mac.solve(k, x_init, use_cache=False, max_iters=30)
    t_off = (time.perf_counter() - t0) / rounds

    print(f"\nMAC.solve Petersen k={k}: cache on {t_on*1e3:.1f} ms, "
          f"off {t_off*1e3:.1f} ms per solve")
    # The two configurations must agree on the objective.
    assert np.isclose(
        mac.evaluate_objective(u_on), mac.evaluate_objective(u_off), rtol=1e-6
    )
    assert np.isclose(b_on, b_off, rtol=1e-6)
