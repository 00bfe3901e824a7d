"""Microbench: weight-table gather variants for assemble_bd (city10000
shapes). Round-5 VERDICT item 1 — fusion.1624 (w_pad[ueid_tbl]) costs
577 us/FW-step in the solve trace; find the output-layout/fusion form
that brings it to the bare-gather bound.

Protocol: reps inside one jitted fori_loop with an ITERATION-DEPENDENT
source (w + i) so nothing hoists; identity-ish floor (the w + i add)
subtracted. One TPU process.
"""

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

DU, NPAD, M = 8, 10112, 20687
REPS = 200


def timed(run, *args):
    out = run(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(*args)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


def loop(body, seed):
    @jax.jit
    def run(w):
        def step(i, c):
            wi = w + i.astype(w.dtype)  # defeat loop-invariant hoisting
            return body(c, wi)
        return jax.lax.fori_loop(0, REPS, step, seed)
    return run


def main():
    rng = np.random.default_rng(0)
    ueid = rng.integers(0, M + 1, size=(DU, NPAD)).astype(np.int32)
    w = jnp.asarray(rng.random(M, dtype=np.float32))
    seed = jnp.zeros((DU, NPAD), jnp.float32)
    seed_m = jnp.zeros((M + 1,), jnp.float32)

    ueid_j = jnp.asarray(ueid)
    perm = jnp.asarray(rng.permutation(M + 1).astype(np.int32))

    def pad(wi):
        return jnp.concatenate([-wi, jnp.zeros((1,), wi.dtype)])

    t_floor = timed(loop(lambda c, wi: c + wi[:1], seed_m[:1]), w)

    # (a) the real form: concat-pad then (du, n_pad) gather
    t_a = timed(loop(lambda c, wi: c + pad(wi)[ueid_j], seed), w)

    # (b) m-sized permutation gather
    t_b = timed(loop(lambda c, wi: c + pad(wi)[perm], seed_m), w)

    # (c) gather flat then reshape (the in-program HLO shape flow)
    t_c = timed(
        loop(lambda c, wi: c + jnp.take(pad(wi), ueid_j.ravel())
             .reshape(DU, NPAD), seed), w)

    # (d) no concat: gather straight from wi (sentinel folded), negate after
    ueid_c = jnp.minimum(ueid_j, M - 1)
    sent = (ueid_j < M).astype(jnp.float32)
    t_d = timed(loop(lambda c, wi: c - wi[ueid_c] * sent, seed), w)

    def us(t):
        return (t - t_floor) / REPS * 1e6

    print(f"floor(w+i)       : {t_floor / REPS * 1e6:9.1f} us/rep")
    print(f"(a) pad+gather   : {us(t_a):9.1f} us")
    print(f"(b) m-perm gather: {us(t_b):9.1f} us")
    print(f"(c) flat+reshape : {us(t_c):9.1f} us")
    print(f"(d) nopad gather : {us(t_d):9.1f} us")


if __name__ == "__main__":
    main()


def main2():
    rng = np.random.default_rng(0)
    ueid = rng.integers(0, M, size=(DU, NPAD)).astype(np.int32)
    w = jnp.asarray(rng.random(M, dtype=np.float32))
    ueid_j = jnp.asarray(ueid)
    sent = jnp.asarray(rng.random((DU, NPAD)) < 0.3, ).astype(jnp.float32)
    seed = jnp.zeros((DU, NPAD), jnp.float32)
    seed4 = jnp.zeros((4, NPAD), jnp.float32)

    t_floor = timed(loop(lambda c, wi: c + wi[:1], jnp.zeros((1,))), w)

    def us(t):
        return (t - t_floor) / REPS * 1e6

    # (e) du=4 gather + mask
    t_e = timed(loop(lambda c, wi: c + wi[ueid_j[:4]] * sent[:4], seed4), w)

    # (f) batched take_along_axis (source broadcast to (DU, M))
    def batched(c, wi):
        w8 = jnp.broadcast_to(wi, (DU, M))
        return c + jnp.take_along_axis(w8, ueid_j, axis=1) * sent
    t_f = timed(loop(batched, seed), w)

    # (g) scatter of 274 elements into a (3,79,128,128) tensor
    ovf_pos = rng.integers(0, 3 * 79 * 128 * 128, size=274).astype(np.int32)
    ovf_eid = jnp.asarray(rng.integers(0, M, size=274).astype(np.int32))
    ovf_pos_j = jnp.asarray(ovf_pos)
    ut_seed = jnp.zeros((3 * 79 * 128 * 128,), jnp.float32)

    def scat(c, wi):
        return c.at[ovf_pos_j].add(wi[ovf_eid])
    t_g = timed(loop(scat, ut_seed), w)

    # (h) bf16 full gather
    seed_bf = jnp.zeros((DU, NPAD), jnp.bfloat16)
    t_h = timed(loop(lambda c, wi: c + (wi.astype(jnp.bfloat16))[ueid_j],
                     seed_bf), w)

    print(f"floor            : {t_floor / REPS * 1e6:9.1f} us/rep")
    print(f"(e) du4 gather   : {us(t_e):9.1f} us")
    print(f"(f) batched TAA  : {us(t_f):9.1f} us")
    print(f"(g) 274-scatter  : {us(t_g):9.1f} us")
    print(f"(h) bf16 gather  : {us(t_h):9.1f} us")


main2()
