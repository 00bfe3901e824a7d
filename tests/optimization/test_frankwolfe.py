"""Frank-Wolfe on analytic problems (reference test style:
tests/optimization/test_frankwolfe.py)."""

import jax.numpy as jnp
import numpy as np

from mac_tpu.optimization.constraints import solve_box_lp, solve_subset_box_lp
from mac_tpu.optimization.frankwolfe import frank_wolfe


def test_solve_box_constraint():
    # max -x^T x over [0,1]^N -> 0.
    problem = lambda x: (-jnp.inner(x, x), -2 * x)
    N = 10
    x, u = frank_wolfe(0.5 * np.ones(N), problem, solve_box_lp)
    assert np.allclose(np.asarray(x), np.zeros(N))


def test_solve_subset_box_constraint():
    # max -x^T x over [0,1]^N, |x| = 1 -> uniform point k/N.
    problem = lambda x: (-jnp.inner(x, x), -2 * x)
    k, N = 1, 2
    solve_lp = lambda g: solve_subset_box_lp(g, k)
    rng = np.random.RandomState(0)
    initial = rng.rand(N)
    initial = (k / np.sum(initial)) * initial
    x, u = frank_wolfe(initial, problem, solve_lp)
    assert np.allclose(np.asarray(x), (k / N) * np.ones(N), atol=0.01)


def test_convergence_around_zero():
    # f(initial) == 0 must not divide-by-zero in the relative-gap check.
    problem = lambda x: (-jnp.inner(x, x) + 0.25, -2 * x)
    N = 10
    initial = np.zeros(N)
    initial[0] = 0.5
    x, u = frank_wolfe(initial, problem, solve_box_lp)
    assert np.allclose(np.asarray(x), np.zeros(N))


def test_dual_upper_bound_is_valid():
    problem = lambda x: (-jnp.inner(x, x), -2 * x)
    N = 5
    x, u = frank_wolfe(0.9 * np.ones(N), problem, solve_box_lp, maxiter=100)
    # Optimal value is 0; u is an upper bound on it and f(x) <= 0 <= u.
    assert float(u) >= 0.0
