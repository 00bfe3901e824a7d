"""TPU microbench: layout variants of the per-FW-step weight gather
wu = w_pad[ueid_tbl] (the single biggest per-step op in the round-4
trace: fusion.1624, 577 us/step at (n_pad=10112, du=8) on city10000).

Hypothesis: the (n_pad, du) output tiles terribly (8 of 128 lanes used;
the fused kernel then PADS it to (n_pad, 128) — 16x VMEM traffic), so
the gather runs at ~0.14 elt/ns instead of the ~0.5 elt/ns output-size
bound. Variants keep the same semantics with different layouts:

  A (n_pad, du)   — current
  B (du, n_pad)   — transposed table: output tiles as du sublanes x
                    n_pad lanes
  C (nb, BS*du)   — row-major regrouped: 1024-lane rows, zero padding
  D (n_pad,du)+pad— current + the kernel's pad to (n_pad, 128), fused
                    (what the solve actually pays per step)

Pattern: reps inside one jitted fori_loop, identity-body floor
subtracted (scripts/profile_banded_parts.py).
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np
import jax
import jax.numpy as jnp

REPS = 200


def bench(fn, *args):
    """Time REPS calls of fn inside one jitted fori_loop (carry = args),
    minus the identity floor."""

    def loop(body):
        @jax.jit
        def run(a):
            return jax.lax.fori_loop(0, REPS, body, a)
        return run

    def body(i, a):
        out = fn(*a)
        # Consume EVERY output element (a reduce) and fold it back into
        # the carry — anything less and XLA slices the gather down to the
        # consumed elements (measured: a .reshape(-1)[0] probe benched 0).
        w = a[0]
        # NONLINEAR reduce: a plain sum(gather(w, const_idx)) is rewritten
        # by XLA into dot(counts, w) and the gather vanishes (measured: a
        # 26M take benched 0 us with a linear sum).
        w = w.at[0].set((out * out).sum())
        return (w,) + a[1:]

    def ident(i, a):
        w = a[0]
        w = w.at[0].set(w.sum() * jnp.float32(1e-9))
        return (w,) + a[1:]

    run, base = loop(body), loop(ident)
    args = jax.block_until_ready(jax.device_put(args))
    run(args)[0].block_until_ready()
    base(args)[0].block_until_ready()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        run(args)[0].block_until_ready()
        ts.append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    base(args)[0].block_until_ready()
    tb = time.perf_counter() - t0
    return (min(ts) - tb) / REPS * 1e6  # us per call


def main():
    rng = np.random.RandomState(0)
    n_pad, du, m = 10112, 8, 20688
    nb, BS = n_pad // 128, 128
    ueid = rng.randint(0, m + 1, size=(n_pad, du)).astype(np.int32)
    w_pad = jnp.asarray(rng.rand(m + 1).astype(np.float32))
    tbl_a = jnp.asarray(ueid)
    tbl_b = jnp.asarray(ueid.T.copy())
    tbl_c = jnp.asarray(ueid.reshape(nb, BS * du).copy())

    us_a = bench(lambda w, t: w[t], w_pad, tbl_a)
    us_b = bench(lambda w, t: w[t], w_pad, tbl_b)
    us_c = bench(lambda w, t: w[t], w_pad, tbl_c)
    us_d = bench(lambda w, t: jnp.pad(w[t], ((0, 0), (0, 120))),
                 w_pad, tbl_a)
    us_e = bench(lambda w, t: w[t], w_pad, tbl_c.reshape(nb * 8, BS))
    print(f"A (n_pad,du) current        : {us_a:8.1f} us")
    print(f"B (du,n_pad) transposed     : {us_b:8.1f} us")
    print(f"C (nb,BS*du) grouped 1024   : {us_c:8.1f} us")
    print(f"D current + pad->(n_pad,128): {us_d:8.1f} us")
    print(f"E (nb*du,BS) grouped 128    : {us_e:8.1f} us")


if __name__ == "__main__":
    main()
