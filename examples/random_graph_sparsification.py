"""Sparsify a random Erdos-Renyi graph with a forced chain, 20% budget,
Madow rounding with best-of-R trials (reference demo:
examples/random_graph_sparsification.py).

Run: python examples/random_graph_sparsification.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo checkout use

import networkx as nx
import numpy as np

from mac_tpu.solvers import MAC
from mac_tpu.utils.conversions import nx_to_mac
from mac_tpu.utils.graphs import select_edges


def main():
    n = 20
    rng = np.random.RandomState(42)
    G = nx.erdos_renyi_graph(n, 0.6, seed=42)
    # Guarantee connectivity of the "fixed" part with a chain.
    for i in range(n - 1):
        G.add_edge(i, i + 1)

    edges = nx_to_mac(G)
    fixed = [e for e in edges if abs(e.i - e.j) == 1]
    candidates = [e for e in edges if abs(e.i - e.j) > 1]

    pct_candidates = 0.2
    k = int(pct_candidates * len(candidates))
    mac = MAC(fixed, candidates, n)

    rounded, unrounded, upper = mac.solve(
        k,
        rounding="madow",
        random_rounding_max_iters=10,
        max_iters=50,
        use_cache=True,
    )

    print(f"n={n}, |fixed|={len(fixed)}, |candidates|={len(candidates)}, k={k}")
    print(f"lambda2(relaxed)  = {mac.evaluate_objective(unrounded):.6f}")
    print(f"lambda2(rounded)  = {mac.evaluate_objective(rounded):.6f}")
    print(f"dual upper bound  = {upper:.6f}")
    print(f"selected edges    = {select_edges(candidates, rounded)}")


if __name__ == "__main__":
    main()
