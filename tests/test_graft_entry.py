"""Regression guard for the driver entry points (__graft_entry__.py).

Round-1 postmortem: a solver refactor changed `_problem_impl`'s signature
and both entry points broke silently — nothing imported them. This test
executes both under the test backend (CPU, 8 virtual devices, configured
by conftest.py before jax init) so any signature drift fails CI.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as graft  # noqa: E402


def test_entry_executes_and_improves():
    fn, args = graft.entry()
    x_new, f, Xnew = jax.jit(fn)(*args)
    jax.block_until_ready((x_new, f))
    params, x0, X0 = args
    assert x_new.shape == x0.shape
    assert Xnew.shape == X0.shape
    assert float(f) > 0.0  # connected graph: lambda_2 > 0
    assert bool(jnp.all(x_new >= 0)) and bool(jnp.all(x_new <= 1))


def test_dryrun_multichip_8():
    # conftest.py already configured 8 virtual CPU devices before jax init,
    # so dryrun_multichip's own env setup is a no-op here; the assertion
    # inside verifies the device pool and the mesh shards both axes.
    graft.dryrun_multichip(8)
