"""Conversions between `Edge` lists and NetworkX graphs.

Parity surface (reference: mac/utils/conversions.py): nx_to_mac, mac_to_nx.
"""

from typing import List

import networkx as nx

from mac_tpu.utils.graphs import Edge


def nx_to_mac(G: nx.Graph) -> List[Edge]:
    """Edge list of `G`, endpoints canonicalized so i < j, default weight 1.

    (reference behavior: mac/utils/conversions.py:9-31)
    """
    edges = []
    for i, j in G.edges():
        weight = G.get_edge_data(i, j).get("weight", 1.0)
        if i < j:
            edges.append(Edge(i, j, weight))
        else:
            edges.append(Edge(j, i, weight))
    return edges


def mac_to_nx(edges: List[Edge]) -> nx.Graph:
    """NetworkX graph with `weight` attributes from a list of edges.

    (reference behavior: mac/utils/conversions.py:34-49)
    """
    G = nx.Graph()
    for e in edges:
        if e.i < e.j:
            G.add_edge(e.i, e.j, weight=e.weight)
        else:
            G.add_edge(e.j, e.i, weight=e.weight)
    return G
