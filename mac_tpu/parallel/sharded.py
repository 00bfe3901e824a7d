"""Multi-chip sharded Laplacian products and solver steps.

Sharding design (SURVEY.md §5 'distributed communication backend'):

  * The ELL adjacency tables are sharded by node-row blocks over the
    'graph' mesh axis; the eigenvector block V (n, q) stays replicated
    (it is tiny relative to the tables for large n). Each device computes
    the output rows of L(w) @ V for its block — pure local gathers — and
    an `all_gather` over ICI re-replicates the result. No scatter, no
    psum on the hot path.
  * Weight vectors are replicated (m is modest); the per-candidate
    gradient is computed replicated.
  * Budget sweeps / rounding trials shard over the 'sweep' axis as plain
    data parallelism (see mac_tpu.parallel.mesh).

This module provides a drop-in `apply_L` for the eigensolver
(mac_tpu.ops.lobpcg) so the full Frank-Wolfe solve jits across a
`jax.sharding.Mesh` unchanged.
"""

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mac_tpu.ops.laplacian import GraphOperator
from mac_tpu.parallel.mesh import pad_to_multiple


class ShardedLaplacian:
    """Node-row-sharded ELL apply over the 'graph' axis of a mesh.

    Built host-side from a GraphOperator; usable inside jit under the mesh.
    """

    def __init__(self, op: GraphOperator, mesh: Mesh):
        assert op.mode == "ell", "sharded apply uses the ELL (gather) path"
        self.mesh = mesh
        self.n = op.n
        g = mesh.shape["graph"]
        nbr = np.asarray(op.nbr_tbl)
        eid = np.asarray(op.eid_tbl)
        # Pad rows so each device gets an equal block; padded rows point at
        # the sentinel edge (weight 0) and node 0, producing zero rows.
        nbr_p, _ = pad_to_multiple(nbr, g, axis=0, fill=0)
        eid_p, _ = pad_to_multiple(eid, g, axis=0, fill=op.m)
        self.n_pad = nbr_p.shape[0]
        graph_sharded = NamedSharding(mesh, P("graph", None))
        self.nbr_tbl = jax.device_put(jnp.asarray(nbr_p), graph_sharded)
        self.eid_tbl = jax.device_put(jnp.asarray(eid_p), graph_sharded)
        self.blk = self.n_pad // g

        def _local(w, V, nbr_blk, eid_blk):
            # w, V replicated; tables are the local row block. The output is
            # left row-sharded over 'graph' — GSPMD inserts the all-gather
            # exactly where a consumer needs replication (e.g. the next
            # gather of V), instead of forcing one here.
            w_pad = jnp.concatenate([w, jnp.zeros((1,), dtype=w.dtype)])
            w_tbl = w_pad[eid_blk]  # (blk, dmax)
            Vn = V[nbr_blk]  # (blk, dmax, q): gather from replicated V
            r = jax.lax.axis_index("graph")
            V_blk = jax.lax.dynamic_slice_in_dim(V, r * self.blk, self.blk, axis=0)
            # Difference form for float32 stability (see laplacian._ell_apply).
            Vd = V_blk[:, None, :] - Vn
            return jnp.einsum("nd,ndq->nq", w_tbl, Vd)

        self._shard_apply = jax.shard_map(
            _local,
            mesh=mesh,
            in_specs=(P(), P(), P("graph", None), P("graph", None)),
            out_specs=P("graph", None),
        )

    def apply(self, w: jax.Array, V: jax.Array) -> jax.Array:
        """L(w) @ V with V of shape (n, q); returns (n, q), replicated."""
        n, q = V.shape
        if self.n_pad != n:
            V = jnp.concatenate(
                [V, jnp.zeros((self.n_pad - n, q), dtype=V.dtype)], axis=0
            )
        out = self._shard_apply(w, V, self.nbr_tbl, self.eid_tbl)
        return out[: self.n]
