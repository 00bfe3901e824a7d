"""Closed-form LP oracles for Frank-Wolfe direction finding.

(reference: mac/optimization/constraints.py)
"""

import jax
import jax.numpy as jnp


def solve_subset_box_lp(g: jax.Array, k: int) -> jax.Array:
    """max <g, x> s.t. 0 <= x <= 1, ||x||_0 <= k: indicator of the top-k
    entries of g (reference: constraints.py:12-22). `k` must be static."""
    g = jnp.asarray(g)
    m = g.shape[0]
    k = int(k)
    if k <= 0:
        return jnp.zeros_like(g)
    if k >= m:
        return jnp.ones_like(g)
    _, idx = jax.lax.top_k(g, k)
    return jnp.zeros_like(g).at[idx].set(1.0)


def solve_subset_box_lp_dynamic(g: jax.Array, k: jax.Array) -> jax.Array:
    """Like solve_subset_box_lp but with a *traced* k (vmappable over
    budgets): indicator of the top-k entries via argsort + rank mask."""
    g = jnp.asarray(g)
    m = g.shape[0]
    order = jnp.argsort(-g)
    sel_sorted = (jnp.arange(m) < k).astype(g.dtype)
    return jnp.zeros_like(g).at[order].set(sel_sorted)


def solve_box_lp(g: jax.Array) -> jax.Array:
    """max <g, x> s.t. 0 <= x <= 1: indicator of positive entries
    (reference: constraints.py:24-37)."""
    g = jnp.asarray(g)
    return jnp.where(g > 0.0, jnp.ones_like(g), jnp.zeros_like(g))
