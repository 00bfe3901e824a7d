"""Graph types and Laplacian utilities.

Host-side graph machinery: the `Edge` container, conversions between edge
lists and packed arrays, and scipy-sparse Laplacian builders used for tests
and interop. The device compute path never materializes sparse matrices —
see `mac_tpu.ops.laplacian` for the matrix-free operators.

Parity surface (reference: mac/utils/graphs.py):
  Edge, weight_graph_lap_from_edge_list, weight_reduced_graph_lap_from_edge_list,
  weight_graph_lap_from_edges, select_edges, get_incidence_vector,
  set_incidence_vector_for_edge_inplace, get_edge_selection_as_binary_mask.
"""

from collections import namedtuple
from typing import List, Tuple, Union

import numpy as np
from scipy.sparse import coo_matrix, csr_matrix

# Edge container: endpoints i, j and a positive weight.
# (reference: mac/utils/graphs.py:11)
Edge = namedtuple("Edge", ["i", "j", "weight"])


def edges_to_arrays(
    edges: List[Edge], dtype=np.float64
) -> Tuple[np.ndarray, np.ndarray]:
    """Pack a list of `Edge` into an (m, 2) int32 index array and an (m,)
    weight array. Accepts an existing (idx, w) pair and passes it through.
    """
    if isinstance(edges, tuple) and len(edges) == 2:
        idx, w = edges
        return np.asarray(idx, dtype=np.int32).reshape(-1, 2), np.asarray(w, dtype=dtype)
    m = len(edges)
    idx = np.zeros((m, 2), dtype=np.int32)
    w = np.zeros((m,), dtype=dtype)
    for t, e in enumerate(edges):
        idx[t, 0] = int(e[0])
        idx[t, 1] = int(e[1])
        w[t] = float(e[2]) if len(e) > 2 else 1.0
    return idx, w


def arrays_to_edges(idx: np.ndarray, w: np.ndarray) -> List[Edge]:
    """Unpack (m, 2) indices + (m,) weights into a list of `Edge`."""
    return [Edge(int(i), int(j), float(wt)) for (i, j), wt in zip(np.asarray(idx), np.asarray(w))]


def laplacian_coo_triplets(
    idx: np.ndarray, w: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """COO triplets of the weighted Laplacian sum_e w_e (e_i - e_j)(e_i - e_j)^T:
    +w at (i,i) and (j,j), -w at (i,j) and (j,i)."""
    i, j = idx[:, 0], idx[:, 1]
    rows = np.concatenate([i, j, i, j])
    cols = np.concatenate([i, j, j, i])
    data = np.concatenate([w, w, -w, -w])
    return rows, cols, data


def weight_graph_lap_from_edge_list(edges: List[Edge], num_nodes: int) -> csr_matrix:
    """Weighted graph Laplacian (scipy CSR) from a list of edges.

    (reference behavior: mac/utils/graphs.py:13-48)
    """
    idx, w = edges_to_arrays(edges)
    rows, cols, data = laplacian_coo_triplets(idx, w)
    return csr_matrix(coo_matrix((data, (rows, cols)), shape=(num_nodes, num_nodes)))


def weight_reduced_graph_lap_from_edge_list(
    edges: List[Edge], num_nodes: int
) -> csr_matrix:
    """Weighted Laplacian with node 0 pinned (row/col 0 removed).

    (reference behavior: mac/utils/graphs.py:51-55)
    """
    return weight_graph_lap_from_edge_list(edges, num_nodes)[1:, 1:]


def weight_graph_lap_from_edges(
    edges: np.ndarray, weights: np.ndarray, num_nodes: int
) -> csr_matrix:
    """Weighted Laplacian from an (m, 2) index array and (m,) weights.

    (reference behavior: mac/utils/graphs.py:58-98)
    """
    idx = np.asarray(edges, dtype=np.int32).reshape(-1, 2)
    w = np.asarray(weights, dtype=np.float64)
    assert idx.shape[0] == w.shape[0]
    rows, cols, data = laplacian_coo_triplets(idx, w)
    return csr_matrix(coo_matrix((data, (rows, cols)), shape=(num_nodes, num_nodes)))


def select_edges(edges: List[Edge], w: np.ndarray) -> List[Edge]:
    """Subset of `edges` whose entry in the binary mask `w` equals one.

    (reference behavior: mac/utils/graphs.py:101-111)
    """
    w = np.asarray(w)
    assert len(edges) == len(w), (
        f"Selection mask length {len(w)} does not match number of edges {len(edges)}"
    )
    return [e for i, e in enumerate(edges) if w[i] == 1.0]


def get_incidence_vector(
    eij: Union[Edge, Tuple[int, int]], num_nodes: int
) -> np.ndarray:
    """Incidence vector a_uv for the edge (u, v): +1 at u, -1 at v.

    (reference behavior: mac/utils/graphs.py:114-130)
    """
    a = np.zeros(num_nodes)
    a[eij[0]] = 1.0
    a[eij[1]] = -1.0
    return a


def set_incidence_vector_for_edge_inplace(
    auv_vec: np.ndarray, edge: Union[Edge, Tuple[int, int]], num_nodes: int
) -> None:
    """Fill `auv_vec` with the *reduced* incidence vector of `edge` (indices
    shifted by -1 because node 0 is pinned; entries at index < 0 are dropped).

    (reference behavior: mac/utils/graphs.py:133-156)
    """
    assert len(auv_vec) == num_nodes - 1
    auv_vec.fill(0)
    i = edge[0] - 1
    j = edge[1] - 1
    if i >= 0:
        auv_vec[i] = 1.0
    if j >= 0:
        auv_vec[j] = -1.0


def get_edge_selection_as_binary_mask(
    edges: List[Edge], selected_edges: List[Edge]
) -> np.ndarray:
    """Binary mask over `edges` marking membership in `selected_edges`.

    (reference behavior: mac/utils/graphs.py:159-179)
    """
    assert len(edges) >= len(selected_edges), (
        "The number of selected edges cannot be greater than the total number of edges."
    )
    selected = set(selected_edges)
    mask = np.zeros(len(edges))
    for i, e in enumerate(edges):
        if e in selected:
            mask[i] = 1.0
    return mask
