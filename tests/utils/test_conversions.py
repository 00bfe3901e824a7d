"""nx <-> mac conversion round trips (reference test style:
tests/utils/test_conversions.py)."""

import networkx as nx
import numpy as np

from mac_tpu.utils.conversions import mac_to_nx, nx_to_mac
from mac_tpu.utils.graphs import Edge


def test_petersen_edge_enumeration():
    G = nx.petersen_graph()
    edges = nx_to_mac(G)
    assert len(edges) == 15
    for e in edges:
        assert e.i < e.j
        assert e.weight == 1.0
        assert G.has_edge(e.i, e.j)


def test_weighted_roundtrip():
    G = nx.petersen_graph()
    rng = np.random.RandomState(7)
    for i, j in G.edges():
        G[i][j]["weight"] = rng.rand()
    G2 = mac_to_nx(nx_to_mac(G))
    G2.graph.update(G.graph)  # graphs_equal also compares graph-level attrs
    assert nx.utils.graphs_equal(G, G2)


def test_canonicalization():
    edges = [Edge(5, 2, 2.5)]
    G = mac_to_nx(edges)
    back = nx_to_mac(G)
    assert back == [Edge(2, 5, 2.5)]
