"""Break down the Rayleigh-Ritz step cost on TPU: Gram (f64 vs f32),
eigh (f64 vs f32), Cholesky+trisolve."""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp


def timeit(name, fn, x, reps=100):
    @jax.jit
    def loop(x):
        return jax.lax.fori_loop(0, reps, lambda i, v: fn(v), x)

    out = jax.block_until_ready(loop(x))
    t0 = time.perf_counter()
    out = jax.block_until_ready(loop(x))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1e6:.0f} us/op", flush=True)


def main():
    n, k = 10240, 12
    rng = np.random.RandomState(0)
    S = jnp.asarray(rng.randn(n, k), jnp.float32)
    H0 = rng.randn(k, k)
    H0 = H0 + H0.T + 30 * np.eye(k)
    H64 = jnp.asarray(H0, jnp.float64)
    H32 = jnp.asarray(H0, jnp.float32)

    def gram32(S):
        G = S.T @ S
        return S + G[0, 0] * 1e-20

    timeit("gram f32 (n,12)^T(n,12)", gram32, S)

    def gram64(S):
        S6 = S.astype(jnp.float64)
        G = S6.T @ S6
        return S + (G[0, 0] * 1e-20).astype(jnp.float32)

    timeit("gram f64 (n,12)^T(n,12)", gram64, S)

    def eigh_fn(H):
        w, V = jnp.linalg.eigh(H)
        return (V * w[None, :]) @ V.T

    timeit("eigh 12x12 f64", eigh_fn, H64)
    timeit("eigh 12x12 f32", eigh_fn, H32)

    def chol_tri(H):
        G = H @ H.T + 12 * jnp.eye(k, dtype=H.dtype)
        R = jnp.linalg.cholesky(G, upper=True)
        Ri = jax.scipy.linalg.solve_triangular(R, jnp.eye(k, dtype=H.dtype), lower=False)
        return Ri @ H

    timeit("chol+trisolve 12x12 f64", chol_tri, H64)
    timeit("chol+trisolve 12x12 f32", chol_tri, H32)

    def apply_coef(S):
        C = (S[:k, :].T + jnp.eye(k, dtype=S.dtype)) * 0.1
        return S @ C

    timeit("(n,12)@(12,12) f32", apply_coef, S)


if __name__ == "__main__":
    main()
