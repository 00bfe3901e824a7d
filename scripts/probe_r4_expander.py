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

    if "p" in stages:
        # Per-outer parts at ELL scale (fori_loop reps, floor-subtracted).
        import time as _t
        from mac_tpu.ops import twogrid as TG
        from mac_tpu.ops.cg import pcg_fixed
        from mac_tpu.ops import lobpcg as LO
        from mac_tpu.ops.laplacian import lap_inf_norm

        FLOOR = [0.0]

        def timeit(name, fn, x, reps=30):
            @jax.jit
            def loop(x):
                def body(i, x):
                    out = fn(x)
                    leaves = jax.tree_util.tree_leaves(out)
                    for lv in leaves:
                        if (hasattr(lv, "shape") and lv.shape == x.shape
                                and lv.dtype == x.dtype):
                            return lv * 0.999 + x * 0.001
                    return x * 0.999 + 0.001 * jnp.mean(
                        leaves[0].astype(x.dtype))
                return jax.lax.fori_loop(0, reps, body, x)

            jax.block_until_ready(loop(x))
            best = 1e9
            for _ in range(2):
                t0 = _t.perf_counter()
                jax.block_until_ready(loop(x))
                best = min(best, (_t.perf_counter() - t0) / reps)
            print(f"  {name}: {max(best - FLOOR[0], 0.0) * 1e3:.2f} ms/op "
                  f"(raw {best * 1e3:.2f})", flush=True)
            return best

        mark("stage p: per-outer parts at ELL scale ...")
        lnorm = jax.jit(lambda w_: lap_inf_norm(mac.op, w_))(w_all)
        cshift = jnp.asarray(lnorm, dt)

        def apply_shifted(Vv):
            return lap_apply(mac.op, w_all, Vv) + LO._shift_term(Vv, cshift)

        Minv = TG.make_twogrid_precond(mac.op, w_all, lambda Vv: lap_apply(
            mac.op, w_all, Vv))
        V12 = jnp.asarray(np.random.RandomState(3).normal(
            size=(n, 12)), dt)
        FLOOR[0] = timeit("identity floor", lambda x: x * 1.0001, V, reps=60)
        timeit("precond BUILD+apply", lambda Vv: TG.make_twogrid_precond(
            mac.op, w_all, lambda u: lap_apply(mac.op, w_all, u))(Vv), V,
            reps=10)
        timeit("Minv V-cycle q4", Minv, V)
        timeit("apply_shifted q4", apply_shifted, V)
        timeit("apply_shifted q12", apply_shifted, V12)
        timeit("pcg10 q4", lambda Vv: pcg_fixed(
            apply_shifted, Vv, Minv, iters=10), V, reps=10)
        timeit("project q4", lambda Vv: Vv - jnp.mean(
            Vv.astype(jnp.float64), axis=0, keepdims=True).astype(dt), V)
        timeit("CGS2 ortho q4-vs-q4", lambda Vv: LO._colnorm(
            LO._ortho_against(V12[:, :4], Vv)), V)
        timeit("orth(S 12) f64 coeff", lambda Vv: LO._orth(
            Vv, jnp.float64), V12, reps=10)
        timeit("gram q12 f64", lambda Vv: LO._gram(
            Vv, Vv, jnp.float64), V12, reps=10)
        timeit("orth(S 12) f32 coeff", lambda Vv: LO._orth(
            Vv, jnp.float32), V12, reps=10)
        timeit("gram q12 f32", lambda Vv: LO._gram(
            Vv, Vv, jnp.float32), V12, reps=10)
        mark("stage p OK")

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
