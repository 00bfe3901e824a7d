"""Test environment setup.

Tests run on the CPU backend with float64 enabled (numerical-parity mode)
and 8 virtual devices so multi-chip sharding paths are exercised without a
TPU pod — the idiomatic JAX fake-distributed backend. Must run before jax
is used anywhere.

NOTE: under the axon TPU plugin the JAX_PLATFORMS *env var* is ignored;
only `jax.config.update("jax_platforms", ...)` reliably selects the CPU
backend, so we set both.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
