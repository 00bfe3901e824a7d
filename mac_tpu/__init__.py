"""mac_tpu — TPU-native algebraic-connectivity graph sparsification.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
MarineRoboticsGroup/mac (maximum algebraic connectivity graph augmentation):
select K candidate edges maximizing lambda_2 of the weighted graph Laplacian,
via a Frank-Wolfe relaxation with a Fiedler-pair oracle, plus greedy
baselines (NaiveGreedy, GreedyEig, GreedyESP) and a pose-graph SLAM
evaluation harness.

Design notes (TPU-first, not a port):
  * The Fiedler-pair oracle is a jitted, warm-started, preconditioned block
    eigensolver (LOBPCG) over matrix-free Laplacian operators — replacing the
    reference's SuperLU/CHOLMOD-backed TRACEMIN (mac/utils/fiedler.py,
    mac/utils/cholesky.py in the reference).
  * Laplacian products use either a dense incidence-matmul path (MXU) for
    small graphs or a padded-adjacency (ELL) gather path for large graphs;
    no scipy sparse matrices on the compute path.
  * The whole Frank-Wolfe solve is one `lax.while_loop` under `jit` with the
    eigenvector block threaded through the carry (the reference's warm-start
    cache, implemented so it actually engages).
  * GreedyESP's incremental sparse-Cholesky effective resistances are
    re-derived through the Woodbury identity over a candidate Gram matrix:
    one batched multi-RHS CG solve + MXU matmuls instead of factor updates.

Canonical imports mirror the reference (`from mac.solvers import MAC`):

    from mac_tpu.solvers import MAC, NaiveGreedy
"""

from mac_tpu.utils.graphs import Edge
from mac_tpu.solvers import MAC, NaiveGreedy

__version__ = "0.1.0"

__all__ = ["Edge", "MAC", "NaiveGreedy", "__version__"]
