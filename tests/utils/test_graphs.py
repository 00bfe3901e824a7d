"""Laplacian assembly parity vs NetworkX (reference test style:
tests/utils/test_graphs.py — analytic/differential oracles)."""

import networkx as nx
import numpy as np
import pytest

from mac_tpu.utils.conversions import nx_to_mac
from mac_tpu.utils.graphs import (
    Edge,
    edges_to_arrays,
    get_edge_selection_as_binary_mask,
    get_incidence_vector,
    select_edges,
    set_incidence_vector_for_edge_inplace,
    weight_graph_lap_from_edge_list,
    weight_graph_lap_from_edges,
    weight_reduced_graph_lap_from_edge_list,
)


@pytest.fixture
def petersen():
    return nx.petersen_graph()


def test_unweighted_laplacian_matches_networkx(petersen):
    edges = nx_to_mac(petersen)
    L = weight_graph_lap_from_edge_list(edges, petersen.number_of_nodes())
    L_nx = nx.laplacian_matrix(petersen).toarray()
    np.testing.assert_allclose(L.toarray(), L_nx)


def test_weighted_laplacian_matches_networkx(petersen):
    rng = np.random.RandomState(7)
    for i, j in petersen.edges():
        petersen[i][j]["weight"] = rng.rand()
    edges = nx_to_mac(petersen)
    L = weight_graph_lap_from_edge_list(edges, petersen.number_of_nodes())
    L_nx = nx.laplacian_matrix(petersen).toarray()
    np.testing.assert_allclose(L.toarray(), L_nx)


def test_array_form_matches_edge_list_form(petersen):
    rng = np.random.RandomState(3)
    for i, j in petersen.edges():
        petersen[i][j]["weight"] = rng.rand()
    edges = nx_to_mac(petersen)
    idx, w = edges_to_arrays(edges)
    n = petersen.number_of_nodes()
    L1 = weight_graph_lap_from_edge_list(edges, n).toarray()
    L2 = weight_graph_lap_from_edges(idx, w, n).toarray()
    np.testing.assert_allclose(L1, L2)


def test_reduced_laplacian_pins_node_zero(petersen):
    edges = nx_to_mac(petersen)
    n = petersen.number_of_nodes()
    L = weight_graph_lap_from_edge_list(edges, n).toarray()
    Lr = weight_reduced_graph_lap_from_edge_list(edges, n).toarray()
    np.testing.assert_allclose(Lr, L[1:, 1:])


def test_select_edges_and_mask_roundtrip():
    edges = [Edge(0, 1, 1.0), Edge(1, 2, 2.0), Edge(0, 2, 3.0)]
    w = np.array([1.0, 0.0, 1.0])
    sel = select_edges(edges, w)
    assert sel == [edges[0], edges[2]]
    mask = get_edge_selection_as_binary_mask(edges, sel)
    np.testing.assert_allclose(mask, w)


def test_incidence_vectors():
    a = get_incidence_vector((2, 5), 7)
    expected = np.zeros(7)
    expected[2] = 1.0
    expected[5] = -1.0
    np.testing.assert_allclose(a, expected)

    # Reduced-indexing variant: entries at index < 0 are dropped.
    auv = np.ones(6)
    set_incidence_vector_for_edge_inplace(auv, (0, 4), 7)
    expected = np.zeros(6)
    expected[3] = -1.0
    np.testing.assert_allclose(auv, expected)
