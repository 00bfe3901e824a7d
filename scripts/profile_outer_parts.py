"""Round-4 TPU microbench: decompose ONE TRACEMIN outer iteration
(mac_tpu.ops.lobpcg.tracemin_fiedler body) into its constituents on
city10000 q=4, to locate the gap between the measured ~6.8 ms/outer
(eigensolve-at-budget probe) and the ~3.3 ms accounted by 10-iter PCG +
the f32 Rayleigh-Ritz step. Same fori_loop + identity-floor methodology
as profile_banded_parts.py."""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np
import jax
import jax.numpy as jnp

from mac_tpu.slam.pose_graph import read_g2o_file, rpm_to_mac, split_edges
from mac_tpu.solvers import NaiveGreedy
from mac_tpu.utils.graphs import edges_to_arrays
from mac_tpu.ops import banded as B
from mac_tpu.ops.cg import pcg_fixed
from mac_tpu.ops import lobpcg as LO
from mac_tpu.utils import fiedler as _fiedler

FLOOR = [0.0]


def timeit(name, fn, *args, reps=100):
    @jax.jit
    def loop(x, *rest):
        def body(i, x):
            out = fn(x, *rest)
            if (hasattr(out, "shape") and out.shape == x.shape
                    and out.dtype == x.dtype):
                return out * 0.999 + x * 0.001
            leaf = jax.tree_util.tree_leaves(out)[0]
            return x * 0.999 + 0.001 * jnp.mean(leaf).astype(x.dtype)
        return jax.lax.fori_loop(0, reps, body, x)

    jax.block_until_ready(loop(*args))
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(*args))
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"{name}: {max(best - FLOOR[0], 0.0)*1e6:.0f} us/op "
          f"(raw {best*1e6:.0f})", flush=True)
    return best


def main():
    measurements, n = read_g2o_file(str(REPO / "data" / "city10000.g2o"))
    fixed, cands = split_edges(rpm_to_mac(measurements))
    k = len(cands) // 2
    x_init = NaiveGreedy(cands).subset(k)
    fi, wf = edges_to_arrays(fixed)
    ci, wc = edges_to_arrays(cands)
    idx = np.concatenate([fi, ci])
    w_np = np.concatenate([wf, x_init * wc])
    dt = jnp.float32

    bop, _ = B.build_banded_rcm(idx, n, dtype=dt)
    w = jnp.asarray(w_np, dt)
    BDw = jax.jit(lambda w: B.assemble_bd(bop, w))(w)
    Minv = B.make_banded_precond(bop, BDw, w=w)
    q = 4
    V4 = jnp.asarray(_fiedler.default_block(n, q), dt)
    cdt = jnp.float32
    c = jnp.asarray(2.0 * 25000.0, dt)
    eps = jnp.finfo(dt).eps
    sigma = 32 * eps * c
    lam = jnp.full((q,), 0.07, dt)
    Xprev = jax.random.normal(jax.random.PRNGKey(7), (n, q), dtype=dt)

    def apply_L(V):
        return B.banded_apply(bop, BDw, V)

    def apply_shifted(V):
        return apply_L(V) + LO._shift_term(V, c)

    def apply_inner(V):
        return apply_shifted(V) + sigma * V

    def project(V):
        m64 = jnp.mean(V.astype(jnp.float64), axis=0, keepdims=True)
        return V - m64.astype(V.dtype)

    FLOOR[0] = timeit("identity floor", lambda x: x * 1.0001, V4, reps=100)

    timeit("apply_L q4", apply_L, V4)
    timeit("apply_inner q4 (L+shift+sigma)", apply_inner, V4)
    timeit("shift_term q4 (f64 mean)", lambda V: LO._shift_term(V, c), V4)
    timeit("project q4 (f64 mean)", project, V4)
    timeit("precond Minv q4", Minv, V4)

    timeit("pcg10 apply_L", lambda V: pcg_fixed(apply_L, V, Minv, iters=10),
           V4, reps=50)
    timeit("pcg10 apply_inner",
           lambda V: pcg_fixed(apply_inner, V, Minv, iters=10,
                               X0=V / 0.07), V4, reps=50)

    def cgs2_block(Y):
        Yp = LO._colnorm(LO._ortho_against(V4, Y))
        Pp = LO._colnorm(LO._ortho_against(V4, Xprev))
        S = jnp.concatenate([V4, Yp, Pp], axis=1)
        return LO._orth(S, cdt)

    timeit("CGS2+concat+orth(3q) f32", cgs2_block, V4)

    Q12 = LO._orth(jnp.concatenate(
        [V4, Xprev, jax.random.normal(jax.random.PRNGKey(3), (n, q), dt)],
        axis=1), cdt)
    Q12 = jax.block_until_ready(Q12)

    def rr_tail(Q):
        AQ = apply_shifted(Q)
        H = LO._gram(Q, AQ, cdt)
        H = (H + H.T) / 2
        evals, C = jnp.linalg.eigh(H)
        Cq = C[:, :q].astype(dt)
        X_new = Q @ Cq
        AX_new = AQ @ Cq
        r = AX_new[:, 0] - evals[0].astype(dt) * X_new[:, 0]
        res = jnp.sum(jnp.abs(r)) / c
        rres = jnp.linalg.norm(r) / jnp.maximum(evals[0].astype(dt), sigma)
        return X_new + res + rres

    timeit("RR tail (AQ+gram+eigh+rotate+residuals)", rr_tail, Q12)
    timeit("eigh 12x12 alone",
           lambda H: jnp.linalg.eigh((H + H.T) / 2)[1],
           jnp.eye(12, dtype=cdt) * jnp.arange(1.0, 13.0, dtype=cdt))

    # One full outer body, composed exactly like tracemin_fiedler.body.
    def outer_body(X):
        inv_lam = 1.0 / jnp.maximum(lam, sigma)
        Y = pcg_fixed(apply_inner, X, Minv, iters=10, X0=X * inv_lam[None, :])
        Y = project(Y)
        Yp = LO._colnorm(LO._ortho_against(X, Y))
        Pp = LO._colnorm(LO._ortho_against(X, Xprev))
        S = jnp.concatenate([X, Yp, Pp], axis=1)
        Q = LO._orth(S, cdt)
        AQ = apply_shifted(Q)
        H = LO._gram(Q, AQ, cdt)
        H = (H + H.T) / 2
        evals, C = jnp.linalg.eigh(H)
        Cq = C[:, :q].astype(dt)
        X_new = Q @ Cq
        AX_new = AQ @ Cq
        r = AX_new[:, 0] - evals[0].astype(dt) * X_new[:, 0]
        res = jnp.sum(jnp.abs(r)) / c
        rres = jnp.linalg.norm(r) / jnp.maximum(evals[0].astype(dt), sigma)
        return X_new + 0.0 * (res + rres)

    timeit("FULL outer body (pcg10+CGS2+RR)", outer_body, V4, reps=20)


if __name__ == "__main__":
    main()
