"""Staged repro of the expander-topology TPU worker crash at n >= 3e5
(round 4: bench_scale --ours-only 300000/1000000 died with "TPU worker
process crashed or restarted ... kernel fault" during the cold solve;
the program contains NO Pallas kernels at that size — the blocked
tridiag kernel is VMEM-gated off — so the fault is an XLA op).

Each stage prints a marker BEFORE dispatching its device program; the
process dies with the faulting stage, so the last marker identifies it.

Usage: python scripts/probe_r4_expander.py [n] [stages]
    stages: subset of "abcde" (default "abcd")
      a = ELL lap_apply on a (n, 4) block
      b = chain tridiag factor + factored solve (the CG preconditioner)
      c = fiedler_pair_op, maxiter=5 (TRACEMIN + two-grid preconditioner)
      d = MAC.solve max_iters=1
      e = MAC.solve max_iters=10 (the full bench_scale configuration)
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import numpy as np
import jax
import jax.numpy as jnp

from bench_scale import synthetic


def mark(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300000
    stages = sys.argv[2] if len(sys.argv) > 2 else "abcd"

    fixed_idx, w_fixed, cand_idx, w_cand = synthetic(n)
    k = len(w_cand) // 4
    m = len(w_cand)
    x_init = np.zeros(m)
    x_init[np.argpartition(w_cand, -k)[-k:]] = 1.0

    from mac_tpu.solvers import MAC
    from mac_tpu.ops.laplacian import lap_apply, lap_tridiagonal_part
    from mac_tpu.ops.tridiag import tridiag_ldl_auto, tridiag_solve_factored_fast
    from mac_tpu.utils import fiedler as F

    mark(f"ctor n={n} m_cand={m} k={k} ...")
    mac = MAC((fixed_idx, w_fixed), (cand_idx, w_cand), n,
              fiedler_inner_iters=10, fiedler_maxiter=60, fiedler_tol=6e-4)
    dt = mac.dtype
    mark(f"ctor done dtype={np.dtype(dt)} op.mode={mac.op.mode} "
         f"dmax={mac.op.nbr_tbl.shape[1]} nc={mac.op.coarse_nc}")

    w_all = jnp.concatenate([
        jnp.asarray(w_fixed, dt), jnp.asarray(x_init * w_cand, dt)])
    V = jnp.asarray(F.default_block(n, 4), dt)

    if "a" in stages:
        mark("stage a: ELL apply compile+run ...")
        f = jax.jit(lap_apply)
        out = jax.block_until_ready(f(mac.op, w_all, V))
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(mac.op, w_all, V))
        mark(f"stage a OK ({(time.perf_counter() - t0) * 1e3:.1f} ms, "
             f"|out|={float(jnp.linalg.norm(out)):.3e})")

    if "b" in stages:
        mark("stage b: chain tridiag factor + solve ...")

        @jax.jit
        def fac_solve(w_, V_):
            d, e = lap_tridiagonal_part(mac.op, w_)
            fct = tridiag_ldl_auto(d + 1e-3, e)
            return tridiag_solve_factored_fast(fct, V_)

        out = jax.block_until_ready(fac_solve(w_all, V))
        t0 = time.perf_counter()
        out = jax.block_until_ready(fac_solve(w_all, V))
        mark(f"stage b OK ({(time.perf_counter() - t0) * 1e3:.1f} ms, "
             f"|out|={float(jnp.linalg.norm(out)):.3e})")

    if "c" in stages:
        mark("stage c: fiedler_pair_op maxiter=5 ...")
        fn = jax.jit(lambda w_, V_: F.fiedler_pair_op(
            mac.op, w_, V_, tol=6e-4, maxiter=5, inner_iters=10,
            chain_w=mac._chain_w))
        res = fn(w_all, V)
        lam = jax.block_until_ready(res.lam)
        t0 = time.perf_counter()
        lam = jax.block_until_ready(fn(w_all, V).lam)
        mark(f"stage c OK ({(time.perf_counter() - t0) * 1e3:.1f} ms, "
             f"lam={np.asarray(lam)})")

    if "d" in stages:
        mark("stage d: MAC.solve max_iters=1 ...")
        t0 = time.perf_counter()
        mac.solve(k, x_init, max_iters=1, use_cache=True)
        mark(f"stage d OK ({time.perf_counter() - t0:.1f} s cold)")

    if "e" in stages:
        mark("stage e: MAC.solve max_iters=10 ...")
        t0 = time.perf_counter()
        rounded, unrounded, upper = mac.solve(
            k, x_init, max_iters=10, use_cache=True)
        mark(f"stage e cold OK ({time.perf_counter() - t0:.1f} s)")
        t0 = time.perf_counter()
        mac.solve(k, x_init, max_iters=10, use_cache=True)
        mark(f"stage e warm OK ({time.perf_counter() - t0:.1f} s, "
             f"lam2={mac.evaluate_objective(unrounded):.4e})")

    mark("ALL STAGES OK")


if __name__ == "__main__":
    main()
