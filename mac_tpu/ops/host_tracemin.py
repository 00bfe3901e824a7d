"""Host-native TRACEMIN Fiedler engine (numpy + scipy splu).

Why this exists alongside the device engine (mac_tpu.ops.lobpcg): the
bundled kitti/ais2klinik instances are tiny, float64-escalated, and pinned
to the in-process CPU backend (see MAC.__init__). There the XLA-CPU
iterative path is latency-bound — each outer iteration costs several
milliseconds of per-op overhead while the whole problem is microseconds of
arithmetic — and a sparse direct factorization of the near-chain Laplacian
is essentially free. This module is the host-side production path for that
regime: the same TRACEMIN structure as the device engine, with the inner
solve performed EXACTLY by one scipy `splu` factorization per weight
vector.

Formulation (our own; differs from the reference's CHOLMOD machinery at
mac/utils/cholesky.py:137-240, which pins the max-degree diagonal to
infinity and re-factorizes with CHOLMOD): the constant nullspace is
removed by GROUNDING node 0 — for b with 1^T b = 0, the unique solution
of L y = b with y[0] = 0 satisfies the reduced system
L[1:, 1:] y[1:] = b[1:], which is SPD and factorizable by plain sparse LU
with negligible fill on near-chain pose graphs. Search blocks are kept
centered (1^perp), so Ritz values are the nonzero spectrum.
"""

from typing import Optional, Tuple

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla


def host_tracemin_fiedler(
    L,
    X0: np.ndarray,
    tol: float = 1e-8,
    maxiter: int = 60,
    rel_tol: float = 1e-8,
    lu=None,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Fiedler pair of the Laplacian L (host, float64), with a q-wide
    Ritz block.

    L: scipy sparse (n, n) Laplacian. X0: (n, q) start block (warm starts
    welcome). `lu`: optional pre-computed splu factor of L[1:, 1:] (reuse
    across calls with the same weights). Returns (lam (q,), X (n, q),
    outer iterations). ONLY the leading pair (lam[0], X[:, 0]) is
    residual-converged — the trailing Ritz pairs are returned solely as
    warm-start state for the next call and may be far from eigenpairs on
    clustered spectra.

    Convergence: the reference tracemin criterion
    ||L x_1 - lam_1 x_1||_1 / ||L||_inf < tol, plus an eigenvalue-relative
    residual ||r||_2 / lam_1 < rel_tol (scale-invariant — meaningful when
    lam_2 / ||L|| underflows the legacy test, e.g. ais2klinik at ~1e-8).
    """
    n = L.shape[0]
    X = np.array(X0, dtype=np.float64, copy=True)
    q = X.shape[1]
    L = L.tocsr()
    lnorm = float(np.abs(L).sum(axis=1).max())
    if lu is None:
        lu = splu_reduced(L)

    def center(B):
        return B - B.mean(axis=0, keepdims=True)

    X = np.linalg.qr(center(X))[0]
    lam = np.zeros(q)
    it = 0
    converged = False
    for it in range(1, maxiter + 1):
        W = L @ X
        H = X.T @ W
        evals, Y = np.linalg.eigh((H + H.T) / 2)
        lam = evals[:q]
        X = X @ Y[:, :q]
        W = W @ Y[:, :q]
        r = W[:, 0] - lam[0] * X[:, 0]
        legacy = np.abs(r).sum() / lnorm
        rres = np.linalg.norm(r) / max(lam[0], 1e-300)
        # Same gating as the device engine (ops/lobpcg.py cond): the legacy
        # criterion ||r||_1/||L||_inf only counts when the eigenvalue-
        # relative residual is also sane — on tiny-lambda_2 graphs
        # (ais2klinik: lambda_2/||L|| ~ 1e-8, exactly this path's clients)
        # legacy underflows any tolerance while the eigenpair is still
        # poor. A plain OR here was measured-loose by ~5 orders of
        # magnitude in rres.
        if (legacy < tol and rres < 2.0) or rres < rel_tol:
            converged = True
            break
        # Exact inverse iteration on the grounded system; re-center to
        # stay in 1^perp and re-orthonormalize.
        Y = np.zeros_like(X)
        Y[1:] = lu.solve(X[1:])
        X = np.linalg.qr(center(Y))[0]
    if not converged:
        # Budget exhausted mid-cycle: finish with a Rayleigh-Ritz pass so
        # the returned block is Ritz-ordered (callers warm-start from it).
        W = L @ X
        H = X.T @ W
        evals, Y = np.linalg.eigh((H + H.T) / 2)
        lam = evals[:q]
        X = X @ Y[:, :q]
    return lam, X, it


def splu_reduced(L):
    """splu factor of the grounded (node-0-removed) Laplacian."""
    Lred = sp.csc_matrix(L.tocsr()[1:, 1:])
    return spla.splu(Lred)
