"""Device-side compute kernels: matrix-free Laplacian operators, the
preconditioned block eigensolver (Fiedler oracle), batched CG, and
preconditioners."""

from mac_tpu.ops.laplacian import (
    GraphOperator,
    build_operator,
    lap_apply,
    lap_dense,
    lap_degrees,
)
from mac_tpu.ops.lobpcg import lobpcg_fiedler, dense_fiedler

__all__ = [
    "GraphOperator",
    "build_operator",
    "lap_apply",
    "lap_dense",
    "lap_degrees",
    "lobpcg_fiedler",
    "dense_fiedler",
]
