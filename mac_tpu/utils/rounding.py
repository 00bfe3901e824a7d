"""Rounding of relaxed solutions onto the binary constraint set.

Device-friendly redesign of the reference's rounding utilities
(reference: mac/utils/rounding.py):

  * round_nearest: top-k selection; the optional tie-break on original edge
    weight is a lexicographic sort (the reference builds a numpy structured
    array, L33-42) — here a single `jnp.lexsort`.
  * round_madow: Madow / systematic sampling expressed with one cumulative
    sum and closed-form interval counting (no Python loop over k as in
    rounding.py:86-92); best-of-R trials is a `vmap` over PRNG keys
    (replacing the sequential re-rounding loop at rounding.py:69-75).

All functions take explicit PRNG keys (JAX-style determinism) instead of
global numpy RNG state.
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def round_nearest(w, k: int, weights=None, break_ties_decimal_tol: Optional[int] = None):
    """Round w in [0,1]^m with |w| ~= k to the indicator of its top-k entries.

    When `weights` and `break_ties_decimal_tol` are given, w is truncated to
    that many decimals and ties are broken in favor of larger original edge
    weight (reference: rounding.py:7-42).
    """
    w = jnp.asarray(w)
    m = w.shape[0]
    k = int(k)
    if k <= 0:
        return jnp.zeros_like(w)
    if k >= m:
        return jnp.ones_like(w)
    if weights is None or break_ties_decimal_tol is None:
        _, idx = jax.lax.top_k(w, k)
        return jnp.zeros_like(w).at[idx].set(1.0)
    scale = 10.0 ** int(break_ties_decimal_tol)
    w_trunc = jnp.round(w * scale) / scale
    weights = jnp.asarray(weights, dtype=w.dtype)
    # lexsort: last key is primary -> sort by (w_trunc, then weight), ascending.
    order = jnp.lexsort((weights, w_trunc))
    top = order[m - k:]
    return jnp.zeros_like(w).at[top].set(1.0)


def round_nearest_np(w, k: int, weights=None,
                     break_ties_decimal_tol: Optional[int] = None):
    """Pure-numpy round_nearest for the host engine: identical semantics
    to round_nearest (same truncation, same stable ascending lexsort with
    the original edge weight as the secondary key), but zero JAX
    dispatches — on the tiny float64-escalated instances the device
    version's lexsort+scatter cost ~2 ms of a ~17 ms solve (kitti_02
    cProfile, round 4)."""
    import numpy as np

    w = np.asarray(w)
    m = w.shape[0]
    k = int(k)
    if k <= 0:
        return np.zeros_like(w)
    if k >= m:
        return np.ones_like(w)
    out = np.zeros_like(w)
    if weights is None or break_ties_decimal_tol is None:
        out[np.argpartition(w, m - k)[m - k:]] = 1.0
        return out
    scale = 10.0 ** int(break_ties_decimal_tol)
    w_trunc = np.round(w * scale) / scale
    order = np.lexsort((np.asarray(weights, dtype=w.dtype), w_trunc))
    out[order[m - k:]] = 1.0
    return out


def round_nearest_dynamic(w, k: jax.Array, weights=None, decimal_tol: int = 10):
    """round_nearest with a *traced* k (vmappable over budgets); always
    applies the lexicographic original-weight tie-break."""
    w = jnp.asarray(w)
    m = w.shape[0]
    scale = 10.0 ** int(decimal_tol)
    w_trunc = jnp.round(w * scale) / scale
    tie = jnp.zeros_like(w) if weights is None else jnp.asarray(weights, w.dtype)
    order = jnp.lexsort((tie, w_trunc))  # ascending; take the top k ranks
    sel_sorted = (jnp.arange(m) >= m - k).astype(w.dtype)
    return jnp.zeros_like(w).at[order].set(sel_sorted)


def round_madow_base_dynamic(w, k: jax.Array, key: jax.Array):
    """round_madow_base with a *traced* k (vmappable over budgets)."""
    w = jnp.asarray(w)
    u = jax.random.uniform(key, (), dtype=w.dtype)
    kf = k.astype(w.dtype)
    total = jnp.sum(w)
    wn = w * (kf / jnp.maximum(total, jnp.finfo(w.dtype).tiny))
    sumw = jnp.cumsum(wn)
    sumw = sumw.at[-1].set(kf)
    pi = jnp.concatenate([jnp.zeros((1,), w.dtype), sumw[:-1]])
    x = jnp.floor(sumw - u) - jnp.floor(pi - u)
    return jnp.clip(x, 0.0, 1.0)


def round_random(w, k: int, key: Optional[jax.Array] = None):
    """Independent Bernoulli rounding: E[#selected] = |w|
    (reference: rounding.py:44-61; the reference draws from global numpy
    state — here the PRNG key is explicit, defaulting deterministically)."""
    w = jnp.asarray(w)
    if key is None:
        key = jax.random.PRNGKey(0)
    r = jax.random.uniform(key, w.shape, dtype=w.dtype)
    return (w > r).astype(w.dtype)


def round_madow_base(w, k: int, key: Optional[jax.Array] = None, u=None):
    """Madow systematic sampling: select exactly k items with inclusion
    probabilities proportional to w (reference: rounding.py:78-95).

    Item i covers the interval [pi_i, pi_i + w_i) of the cumulative weight
    line (total renormalized to exactly k); item i is selected iff the
    interval contains some u + t, t = 0..k-1. Since each interval has length
    <= 1 this is  floor(cumsum_i - u) - floor(pi_i - u)  in {0, 1}.
    Guaranteed to select exactly k items (the reference asserts this at
    runtime, rounding.py:94; here it holds by construction).
    """
    w = jnp.asarray(w)
    k = int(k)
    if k <= 0:
        return jnp.zeros_like(w)
    if u is None:
        u = jax.random.uniform(key, (), dtype=w.dtype)
    total = jnp.sum(w)
    wn = w * (k / total)
    sumw = jnp.cumsum(wn)
    sumw = sumw.at[-1].set(float(k))  # exact endpoint against fp drift
    pi = jnp.concatenate([jnp.zeros((1,), w.dtype), sumw[:-1]])
    x = jnp.floor(sumw - u) - jnp.floor(pi - u)
    return jnp.clip(x, 0.0, 1.0)


def round_madow(
    w,
    k: int,
    key: jax.Array,
    value_fn: Optional[Callable] = None,
    max_iters: int = 1,
):
    """Best-of-`max_iters` Madow rounding, trials evaluated in a batch
    (reference: rounding.py:63-75, sequential there)."""
    if value_fn is None or max_iters == 1:
        return round_madow_base(w, k, key)
    keys = jax.random.split(key, max_iters)
    xs = jax.vmap(lambda kk: round_madow_base(w, k, kk))(keys)
    vals = value_fn(xs)  # batched: (R, m) -> (R,)
    best = jnp.argmax(vals)
    return xs[best]
