"""Preconditioned conjugate gradients, blocked over multiple right-hand sides.

Two flavors:
  * `pcg_fixed`: a fixed number of iterations, no convergence test —
    branch-free, used as the eigensolver's preconditioner (an inexact
    shift-invert; see mac_tpu.ops.lobpcg).
  * `pcg`: tolerance-based with per-column convergence masking inside one
    `lax.while_loop` — used for the batched effective-resistance solves of
    GreedyESP (replacing CHOLMOD forward solves, reference:
    mac/utils/cholesky.py:87-105, mac/solvers/greedy_esp.py:307-325).

All operations are columnwise-vectorized over the (n, q) block: one ELL/
dense Laplacian product per iteration serves every RHS.
"""

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


def _identity(B):
    return B


def pcg_fixed(
    apply_A: Callable,
    B: jax.Array,
    Minv: Optional[Callable] = None,
    iters: int = 16,
    X0: Optional[jax.Array] = None,
) -> jax.Array:
    """`iters` PCG steps toward A X = B from X0 (default 0). Columnwise step
    sizes; division guards make exhausted columns inert rather than NaN."""
    if Minv is None:
        Minv = _identity
    eps = jnp.finfo(B.dtype).tiny

    def safe_div(a, b):
        return a / jnp.where(jnp.abs(b) > eps, b, 1.0) * (jnp.abs(b) > eps)

    if X0 is None:
        X = jnp.zeros_like(B)
        R = B
    else:
        X = X0
        R = B - apply_A(X0)
    Z = Minv(R)
    P = Z
    rz = jnp.sum(R * Z, axis=0)

    def body(_, carry):
        X, R, Z, P, rz = carry
        AP = apply_A(P)
        alpha = safe_div(rz, jnp.sum(P * AP, axis=0))
        X = X + alpha[None, :] * P
        R = R - alpha[None, :] * AP
        Z = Minv(R)
        rz_new = jnp.sum(R * Z, axis=0)
        beta = safe_div(rz_new, rz)
        P = Z + beta[None, :] * P
        return (X, R, Z, P, rz_new)

    X, *_ = jax.lax.fori_loop(0, iters, body, (X, R, Z, P, rz))
    return X


class CGResult(NamedTuple):
    X: jax.Array
    iters: jax.Array
    resnorm: jax.Array  # (q,) final residual 2-norms


def pcg(
    apply_A: Callable,
    B: jax.Array,
    Minv: Optional[Callable] = None,
    tol: float = 1e-10,
    maxiter: int = 1000,
    X0: Optional[jax.Array] = None,
) -> CGResult:
    """PCG to relative tolerance ||r_j|| <= tol * ||b_j|| per column."""
    if Minv is None:
        Minv = _identity
    eps = jnp.finfo(B.dtype).tiny

    def safe_div(a, b):
        return a / jnp.where(jnp.abs(b) > eps, b, 1.0) * (jnp.abs(b) > eps)

    bnorm = jnp.linalg.norm(B, axis=0)
    thresh = tol * jnp.maximum(bnorm, eps)

    if X0 is None:
        X = jnp.zeros_like(B)
        R = B
    else:
        X = X0
        R = B - apply_A(X0)
    Z = Minv(R)
    P = Z
    rz = jnp.sum(R * Z, axis=0)

    def cond(carry):
        X, R, Z, P, rz, it = carry
        rn = jnp.linalg.norm(R, axis=0)
        return jnp.logical_and(it < maxiter, jnp.any(rn > thresh))

    def body(carry):
        X, R, Z, P, rz, it = carry
        active = (jnp.linalg.norm(R, axis=0) > thresh).astype(B.dtype)
        AP = apply_A(P)
        alpha = safe_div(rz, jnp.sum(P * AP, axis=0)) * active
        X = X + alpha[None, :] * P
        R = R - alpha[None, :] * AP
        Z = Minv(R)
        rz_new = jnp.sum(R * Z, axis=0)
        beta = safe_div(rz_new, rz) * active
        P = Z * active[None, :] + beta[None, :] * P
        rz = jnp.where(active > 0, rz_new, rz)
        return (X, R, Z, P, rz, it + 1)

    it0 = jnp.asarray(0, jnp.int32)
    X, R, Z, P, rz, it = jax.lax.while_loop(cond, body, (X, R, Z, P, rz, it0))
    return CGResult(X=X, iters=it, resnorm=jnp.linalg.norm(R, axis=0))
