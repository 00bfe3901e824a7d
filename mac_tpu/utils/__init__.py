from mac_tpu.utils.graphs import (
    Edge,
    edges_to_arrays,
    arrays_to_edges,
    weight_graph_lap_from_edge_list,
    weight_reduced_graph_lap_from_edge_list,
    weight_graph_lap_from_edges,
    select_edges,
    get_incidence_vector,
    set_incidence_vector_for_edge_inplace,
    get_edge_selection_as_binary_mask,
)
from mac_tpu.utils.conversions import nx_to_mac, mac_to_nx

__all__ = [
    "Edge",
    "edges_to_arrays",
    "arrays_to_edges",
    "weight_graph_lap_from_edge_list",
    "weight_reduced_graph_lap_from_edge_list",
    "weight_graph_lap_from_edges",
    "select_edges",
    "get_incidence_vector",
    "set_incidence_vector_for_edge_inplace",
    "get_edge_selection_as_binary_mask",
    "nx_to_mac",
    "mac_to_nx",
]
