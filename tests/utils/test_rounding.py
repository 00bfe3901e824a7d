"""Rounding properties: exact cardinality, tie-breaks, Madow inclusion
probabilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mac_tpu.utils.rounding import (
    round_madow,
    round_madow_base,
    round_nearest,
    round_random,
)


def test_round_nearest_topk():
    w = np.array([0.1, 0.9, 0.5, 0.8, 0.2])
    r = np.asarray(round_nearest(w, 2))
    np.testing.assert_allclose(r, [0, 1, 0, 1, 0])


def test_round_nearest_tiebreak_prefers_larger_weight():
    w = np.array([0.5, 0.5, 0.5, 0.1])
    weights = np.array([1.0, 3.0, 2.0, 10.0])
    r = np.asarray(round_nearest(w, 2, weights=weights, break_ties_decimal_tol=10))
    # Ties on w broken by original weight: picks indices 1 and 2.
    np.testing.assert_allclose(r, [0, 1, 1, 0])


def test_round_nearest_extremes():
    w = np.array([0.3, 0.4])
    assert np.asarray(round_nearest(w, 0)).sum() == 0
    assert np.asarray(round_nearest(w, 5)).sum() == 2


@pytest.mark.parametrize("k", [1, 3, 7])
def test_madow_exact_cardinality(k):
    rng = np.random.RandomState(k)
    w = rng.rand(20)
    w = w * (k / w.sum())
    for s in range(20):
        x = np.asarray(round_madow_base(w, k, jax.random.PRNGKey(s)))
        assert x.sum() == k
        assert set(np.unique(x)).issubset({0.0, 1.0})


def test_madow_inclusion_probabilities():
    # E[x_i] == w_i for Madow sampling.
    k = 3
    rng = np.random.RandomState(0)
    w = rng.rand(10)
    w = w * (k / w.sum())
    trials = 4000
    keys = jax.random.split(jax.random.PRNGKey(0), trials)
    xs = jax.vmap(lambda kk: round_madow_base(w, k, kk))(keys)
    freq = np.asarray(xs).mean(axis=0)
    np.testing.assert_allclose(freq, w, atol=0.03)


def test_round_madow_best_of_R():
    w = np.array([0.5, 0.5, 0.5, 0.5])
    value_fn = lambda xs: jnp.asarray(xs)[:, 0]  # prefer trials selecting item 0
    x = np.asarray(round_madow(w, 2, jax.random.PRNGKey(1), value_fn=value_fn, max_iters=8))
    assert x[0] == 1.0
    assert x.sum() == 2


def test_round_random_expectation():
    w = np.full(50, 0.3)
    keys = jax.random.split(jax.random.PRNGKey(2), 200)
    xs = np.asarray(jax.vmap(lambda kk: round_random(w, 15, kk))(keys))
    assert abs(xs.mean() - 0.3) < 0.03


def test_dynamic_variants_match_static():
    import jax.numpy as jnp
    from mac_tpu.utils.rounding import round_madow_base_dynamic, round_nearest_dynamic

    rng = np.random.RandomState(5)
    w = rng.rand(30)
    weights = rng.rand(30)
    for k in [1, 7, 15]:
        stat = np.asarray(round_nearest(w, k, weights=weights, break_ties_decimal_tol=10))
        dyn = np.asarray(round_nearest_dynamic(w, jnp.asarray(k), weights=weights))
        np.testing.assert_allclose(stat, dyn)

        wk = w * (k / w.sum())
        key = jax.random.PRNGKey(k)
        stat_m = np.asarray(round_madow_base(wk, k, key))
        dyn_m = np.asarray(round_madow_base_dynamic(wk, jnp.asarray(k), key))
        np.testing.assert_allclose(stat_m, dyn_m)
        assert dyn_m.sum() == k


def test_round_nearest_np_matches_jax():
    """The host engine's pure-numpy round_nearest must reproduce the
    device version exactly, including the decimal truncation + original
    -weight tie-break (ties are engineered below via duplicated values)."""
    from mac_tpu.utils.rounding import round_nearest_np

    rng = np.random.RandomState(11)
    w = np.round(rng.rand(40), 2)  # duplicates -> real ties at tol 10
    w[5] = w[17]
    weights = rng.rand(40)
    for k in [0, 1, 9, 20, 40, 45]:
        jx = np.asarray(round_nearest(w, k, weights=weights,
                                      break_ties_decimal_tol=10))
        npv = round_nearest_np(w, k, weights=weights,
                               break_ties_decimal_tol=10)
        np.testing.assert_allclose(jx, npv)
        plain_j = np.asarray(round_nearest(w, k))
        plain_n = round_nearest_np(w, k)
        assert plain_n.sum() == plain_j.sum()
        if 0 < k < 40:
            assert plain_n.sum() == k
