"""Surgical isolation: which float32 component floors TRACEMIN convergence?

Runs a python-level tracemin loop with jitted per-iteration steps and
selective float64 upcasting. Logs the f64-refined Rayleigh quotient per
iteration.
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_enable_x64", True)  # enables *explicit* f64 on TPU

import jax.numpy as jnp
import numpy as np

from mac_tpu.slam.pose_graph import read_g2o_file, rpm_to_mac, split_edges
from mac_tpu.solvers import NaiveGreedy
from mac_tpu.utils import fiedler as _fiedler
from mac_tpu.utils.graphs import edges_to_arrays, weight_graph_lap_from_edges
from mac_tpu.ops.laplacian import (
    build_operator, lap_apply, lap_inf_norm, lap_tridiagonal_part,
)
from mac_tpu.ops.cg import pcg_fixed
from mac_tpu.ops.tridiag import tridiag_ldl, tridiag_solve_factored
from mac_tpu.ops.lobpcg import _orth, _colnorm


def main():
    measurements, n = read_g2o_file(str(REPO / "data" / "city10000.g2o"))
    fixed, cands = split_edges(rpm_to_mac(measurements))
    k = len(cands) // 2
    x_init = NaiveGreedy(cands).subset(k)
    fixed_idx, w_fixed = edges_to_arrays(fixed)
    cand_idx, w_cand = edges_to_arrays(cands)
    all_idx = np.concatenate([fixed_idx, cand_idx])
    w_np = np.concatenate([w_fixed, x_init * w_cand])

    import scipy.sparse.linalg as spla
    L = weight_graph_lap_from_edges(all_idx, w_np, n)
    vals = spla.eigsh(L, k=2, sigma=-1e-4, which="LM", return_eigenvectors=False)
    lam_true = float(np.sort(vals)[-1])
    print("lam_true", lam_true, flush=True)

    op = build_operator(all_idx, n)
    q = 4

    def make_step(dt_main, dt_minv, dt_cg, dt_rr, inner):
        """One tracemin iteration with per-component dtypes. Everything
        lives inside the jitted step: eager TPU dispatch through the axon
        tunnel is pathologically slow."""
        w_main = jnp.asarray(w_np, dt_main)
        c = 2.0 * float(np.max(np.bincount(all_idx.ravel(), weights=np.concatenate([w_np, w_np]))))
        w_cg = jnp.asarray(w_np, dt_cg)
        w_minv = jnp.asarray(w_np, dt_minv)

        def make_fac():
            d, e = lap_tridiagonal_part(op, w_minv)
            eps_m = 100 * jnp.finfo(dt_minv).eps
            return tridiag_ldl(d + eps_m * jnp.max(d), e)

        def apply_main(V):
            V = V.astype(dt_main)
            return (lap_apply(op, w_main, V)
                    + jnp.asarray(c, dt_main) * jnp.mean(V, axis=0, keepdims=True))

        def apply_cg(V):
            V = V.astype(dt_cg)
            out = lap_apply(op, w_cg, V) + jnp.asarray(c, dt_cg) * jnp.mean(V, axis=0, keepdims=True)
            return out + (32 * jnp.finfo(dt_cg).eps * jnp.asarray(c, dt_cg)) * V

        def center(B):
            return B - jnp.mean(B, axis=0, keepdims=True)

        @jax.jit
        def step(X, lam):
            fac = make_fac()

            def Minv(B):
                B64 = B.astype(dt_minv)
                out = center(tridiag_solve_factored(fac, center(B64)))
                return out.astype(dt_cg)

            sigma = 32 * jnp.finfo(dt_cg).eps * jnp.asarray(c, dt_cg)
            inv_lam = 1.0 / jnp.maximum(lam.astype(dt_cg), sigma)
            Y = pcg_fixed(apply_cg, X.astype(dt_cg), Minv, iters=inner,
                          X0=X.astype(dt_cg) * inv_lam[None, :])
            Y = center(Y)
            S = jnp.concatenate([X.astype(dt_rr), _colnorm(Y).astype(dt_rr)], axis=1)
            Q = _orth(S)
            AQ = apply_main(Q.astype(dt_main)).astype(dt_rr)
            H = Q.T @ AQ
            H = (H + H.T) / 2
            evals, C = jnp.linalg.eigh(H)
            X_new = (Q @ C[:, :q]).astype(jnp.float32)
            return X_new, evals[:q].astype(jnp.float32)

        return step

    Lcsr = L.tocsr()

    def refined(X):
        v = np.asarray(X[:, 0], np.float64)
        v -= v.mean()
        return float(v @ (Lcsr @ v) / (v @ v))

    f32, f64 = jnp.float32, jnp.float64
    configs = [
        ("all-f32", f32, f32, f32, f32, 16),
        ("minv-f64", f32, f64, f32, f32, 16),
        ("cg+minv-f64", f32, f64, f64, f32, 16),
        ("rr-f64", f32, f32, f32, f64, 16),
        ("all-f64", f64, f64, f64, f64, 16),
    ]
    X_init = jnp.asarray(_fiedler.default_block(n, q), jnp.float32)
    lam_init = jnp.ones((q,), jnp.float32)

    for name, a, b, cdt, d_, inner in configs:
        step = make_step(a, b, cdt, d_, inner)
        X, lam = X_init, lam_init
        t0 = time.perf_counter()
        traj = []
        for it in range(40):
            X, lam = step(X, lam)
            if it % 5 == 4 or it < 3:
                traj.append((it + 1, refined(X)))
        jax.block_until_ready(X)
        dt = time.perf_counter() - t0
        msg = " ".join(f"{i}:{abs(r - lam_true)/lam_true:.1e}" for i, r in traj)
        print(f"{name}: {msg}  [{dt:.1f}s]", flush=True)


if __name__ == "__main__":
    main()
