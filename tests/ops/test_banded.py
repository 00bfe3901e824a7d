"""Tests for the block-banded MXU Laplacian formulation (mac_tpu.ops.banded).

Oracle strategy: the ELL difference-form apply (itself validated against
networkx/scipy in tests/utils) and dense eigh.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mac_tpu.ops.banded import (
    BS,
    assemble_bd,
    banded_apply,
    build_banded,
    build_banded_rcm,
    make_banded_precond,
    rcm_order,
)
from mac_tpu.ops.laplacian import build_operator, lap_apply
from mac_tpu.utils.graphs import weight_graph_lap_from_edges


def _pose_graph(n=700, n_loops=260, span=40, seed=3):
    """Chain + short-range loop closures: banded after RCM."""
    rng = np.random.RandomState(seed)
    chain = np.stack([np.arange(n - 1), np.arange(1, n)], 1)
    loops = set()
    while len(loops) < n_loops:
        i = rng.randint(0, n - 2)
        j = min(n - 1, i + 2 + rng.randint(span))
        if j - i > 1:
            loops.add((i, j))
    idx = np.concatenate([chain, np.array(sorted(loops))]).astype(np.int64)
    w = 0.5 + rng.rand(len(idx))
    return idx, w, n


def test_rcm_order_is_permutation():
    idx, w, n = _pose_graph()
    perm, inv, bw = rcm_order(idx, n)
    assert sorted(perm) == list(range(n))
    assert np.array_equal(perm[inv], np.arange(n))
    assert 0 < bw <= 2 * 42


def test_build_banded_rejects_expanders():
    rng = np.random.RandomState(0)
    n = 600
    idx = np.stack([np.arange(n - 1), np.arange(1, n)], 1)
    rand = rng.randint(0, n, size=(800, 2))
    rand = rand[np.abs(rand[:, 0] - rand[:, 1]) > 1]
    idx = np.concatenate([idx, np.sort(rand, axis=1)])
    perm, inv, bw = rcm_order(idx, n)
    # Random long-range edges destroy bandedness.
    assert build_banded(inv[idx], n) is None or bw <= 640


def test_assemble_matches_dense_blocks():
    idx, w, n = _pose_graph()
    perm, inv, bw = rcm_order(idx, n)
    ridx = inv[idx]
    bop = build_banded(ridx, n, dtype=jnp.float64)
    assert bop is not None
    rep = assemble_bd(bop, jnp.asarray(w, jnp.float64))
    # BDRep stores the uppers TRANSPOSED (ut[t][b] = up-block^T); undo it
    # here so the expectations below stay in natural L-block orientation.
    up = np.swapaxes(np.asarray(rep.ut), -1, -2)
    deg = np.asarray(rep.deg)
    L = weight_graph_lap_from_edges(ridx, w, n).toarray()
    Lp = np.zeros((bop.n_pad, bop.n_pad))
    Lp[:n, :n] = L
    half = bop.half
    for b in range(bop.nb):
        for t in range(half + 1):
            bc = b + t
            expect = np.zeros((BS, BS))
            if bc < bop.nb:
                expect = Lp[b * BS:(b + 1) * BS, bc * BS:(bc + 1) * BS].copy()
            if t == 0:
                # up[0] stores the STRICT upper triangle; degrees separate.
                np.testing.assert_allclose(
                    deg[b], np.diag(Lp[b * BS:(b + 1) * BS,
                                       b * BS:(b + 1) * BS]), atol=1e-12)
                expect = np.triu(expect, k=1)
            np.testing.assert_allclose(up[t, b], expect, atol=1e-12)


def test_banded_apply_matches_ell_f64():
    idx, w, n = _pose_graph()
    perm, inv, bw = rcm_order(idx, n)
    ridx = inv[idx].astype(np.int32)
    bop = build_banded(ridx, n, dtype=jnp.float64)
    BD = assemble_bd(bop, jnp.asarray(w, jnp.float64))
    rng = np.random.RandomState(1)
    V = jnp.asarray(rng.normal(size=(n, 4)))
    op = build_operator(ridx, n, mode="ell")
    ref = lap_apply(op, jnp.asarray(w), V)
    got = banded_apply(bop, BD, V)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-10, atol=1e-10)


def test_banded_apply_f32_stable_on_smooth_vectors():
    """The local-centering trick must keep f32 error at the difference-form
    level (~1e-6 of max|LV|), far below naive dense-matmul cancellation."""
    idx, w, n = _pose_graph(n=900, n_loops=400)
    perm, inv, bw = rcm_order(idx, n)
    ridx = inv[idx].astype(np.int32)
    bop = build_banded(ridx, n, dtype=jnp.float32)
    t = np.linspace(0, 1, n)
    V = np.stack([np.sin((k + 1) * np.pi * t) for k in range(4)], 1)
    op = build_operator(ridx, n, mode="ell")
    ref = np.asarray(lap_apply(op, jnp.asarray(w, jnp.float64),
                               jnp.asarray(V, jnp.float64)))
    BD = assemble_bd(bop, jnp.asarray(w, jnp.float32))
    got = np.asarray(banded_apply(bop, BD, jnp.asarray(V, jnp.float32)))
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 5e-6, rel


def test_assemble_fused_kernel_matches_xla():
    """The Pallas assembly kernel (interpret mode on CPU) must reproduce
    the XLA sheared path bit-for-bit — both are sums of disjoint slot
    contributions in slot order."""
    from mac_tpu.ops.banded import _assemble_ut_xla
    from mac_tpu.ops.pallas.assemble_kernel import assemble_ut_fused

    idx, w, n = _pose_graph(n=700, n_loops=260)
    perm, inv, bw = rcm_order(idx, n)
    bop = build_banded(inv[idx].astype(np.int32), n, dtype=jnp.float32)
    assert bop is not None
    w32 = jnp.asarray(w, jnp.float32)
    w_pad = jnp.concatenate([-w32, jnp.zeros((1,), jnp.float32)])
    wu = w_pad[bop.ueid_tbl]
    ref = np.asarray(_assemble_ut_xla(bop, wu))
    got = np.asarray(assemble_ut_fused(bop.dcol_tbl, wu, half=bop.half,
                                       nb=bop.nb, interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("n,n_loops,span", [
    (560, 80, 6),      # half = 1 (single upper diagonal), tiny du
    (700, 420, 70),    # wider band / larger du than the base test
    (1100, 250, 120),  # n not a multiple of BS, half >= 3
])
def test_assemble_fused_kernel_matches_xla_shapes(n, n_loops, span):
    """Parity across unroll regimes: different half (tile-write count)
    and du (compare-accumulate pass count) configurations must all
    reproduce the XLA sheared assembly bit-for-bit."""
    from mac_tpu.ops.banded import _assemble_ut_xla
    from mac_tpu.ops.pallas.assemble_kernel import assemble_ut_fused

    idx, w, n = _pose_graph(n=n, n_loops=n_loops, span=span, seed=11)
    perm, inv, bw = rcm_order(idx, n)
    bop = build_banded(inv[idx].astype(np.int32), n, dtype=jnp.float32)
    assert bop is not None
    w32 = jnp.asarray(w, jnp.float32)
    w_pad = jnp.concatenate([-w32, jnp.zeros((1,), jnp.float32)])
    wu = w_pad[bop.ueid_tbl]
    ref = np.asarray(_assemble_ut_xla(bop, wu))
    got = np.asarray(assemble_ut_fused(bop.dcol_tbl, wu, half=bop.half,
                                       nb=bop.nb, interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)


def test_assemble_fused_overflow_kernel_matches_xla():
    """The overflow-split kernel (round 5: dense slots gathered, tail
    applied from per-block SMEM tables) must reproduce the XLA all-slots
    assembly. Equality is to f32 addend-reorder tolerance: overflow nodes
    accumulate dense slots first, then overflow entries."""
    from mac_tpu.ops.banded import OV_CAP, _assemble_ut_xla
    from mac_tpu.ops.pallas.assemble_kernel import assemble_ut_fused_ov

    # Heavy-tailed upper degrees (city10000's regime): a dense loop-
    # closure load makes du large while the tail stays thin — measured
    # du=7 with slot occupancy [1499, 851, 283, 56, 6, 3, 1], splitting
    # at du_dense=4 with 4 overflow rows.
    idx, w, n = _pose_graph(n=1500, n_loops=1200, span=25, seed=3)
    perm, inv, bw = rcm_order(idx, n)
    bop = build_banded(inv[idx].astype(np.int32), n, dtype=jnp.float32)
    assert bop is not None
    assert bop.ov_rows > 0, "test graph must trigger the overflow split"
    assert bop.ov_rows <= OV_CAP
    assert bop.du_dense < bop.ueid_tbl.shape[0]
    w32 = jnp.asarray(w, jnp.float32)
    w_pad = jnp.concatenate([-w32, jnp.zeros((1,), jnp.float32)])
    ref = np.asarray(_assemble_ut_xla(bop, w_pad[bop.ueid_tbl]))
    got = np.asarray(assemble_ut_fused_ov(
        bop.dcol_tbl[:bop.du_dense], w_pad[bop.ueid_tbl[:bop.du_dense]],
        bop.ocol_tbl, bop.olane_tbl, w_pad[bop.oeid_tbl],
        half=bop.half, nb=bop.nb, interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)
    # And end-to-end through assemble_bd's fused dispatch (interpret is
    # kernel-level only, so exercise the op via the XLA-parity identity
    # of the degree reduction instead).
    from mac_tpu.ops.banded import assemble_bd
    bd_x = assemble_bd(bop, w32, fused=False)
    np.testing.assert_allclose(np.asarray(bd_x.ut), ref, rtol=0, atol=0)


def test_assemble_fused_vmap_falls_back_to_xla():
    """vmapping the fused assembly op (budget sweeps) must route through
    the XLA batch rule and match per-lane XLA assembly."""
    from mac_tpu.ops.banded import _assemble_ut_fused_op, _assemble_ut_xla

    idx, w, n = _pose_graph(n=700, n_loops=120)
    perm, inv, bw = rcm_order(idx, n)
    bop = build_banded(inv[idx].astype(np.int32), n, dtype=jnp.float32)
    assert bop is not None
    rng = np.random.RandomState(5)
    ws = jnp.asarray(0.5 + rng.rand(3, len(w)), jnp.float32)
    w_pad = jnp.concatenate([-ws, jnp.zeros((3, 1), jnp.float32)], axis=1)
    got = jax.vmap(lambda wp: _assemble_ut_fused_op(bop, wp))(w_pad)
    ref = jnp.stack([_assemble_ut_xla(bop, w_pad[i][bop.ueid_tbl])
                     for i in range(3)])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("smoother,kind", [
    ("chain", "mult"), ("bjacobi", "mult"), ("chain", "additive"),
])
def test_banded_precond_symmetric_and_effective(smoother, kind):
    idx, w, n = _pose_graph()
    bop, ridx = build_banded_rcm(idx, n, dtype=jnp.float64)
    assert bop is not None
    wj = jnp.asarray(w, jnp.float64)
    BD = assemble_bd(bop, wj)
    M = make_banded_precond(bop, BD, w=wj, smoother=smoother, kind=kind)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.normal(size=(n, 1)))
    y = jnp.asarray(rng.normal(size=(n, 1)))
    mx, my = M(x), M(y)
    ip1 = float(jnp.sum(mx * y))
    ip2 = float(jnp.sum(x * my))
    assert abs(ip1 - ip2) < 1e-8 * max(abs(ip1), 1.0)

    if kind == "additive":
        # M^-1 = S + P Lc^-1 R double-counts smooth components, so a raw
        # Richardson step is not a contraction — additive is a CG/Krylov
        # preconditioner only. Assert positive definiteness on probes.
        for _ in range(4):
            z = jnp.asarray(rng.normal(size=(n, 1)))
            assert float(jnp.sum(z * M(z))) > 0.0
        return

    # Effectiveness: one preconditioned Richardson step on L u = b (with b
    # centered) must beat plain diagonal scaling by a wide margin.
    u = rng.normal(size=(n, 1))
    u -= u.mean()
    b = np.asarray(banded_apply(bop, BD, jnp.asarray(u)))
    err0 = np.linalg.norm(u)
    e_pc = u - np.asarray(M(jnp.asarray(b)))
    e_pc -= e_pc.mean()
    assert np.linalg.norm(e_pc) < 0.7 * err0


def test_precond_rebuild_skip_reuses_coarse_inverse():
    """rebuild=False must reuse the carried coarse inverse verbatim (no
    assembly, no Newton-Schulz); rebuild=True must match the
    always-rebuild (rebuild=None) path."""
    from mac_tpu.ops.banded import PrecondState

    idx, w, n = _pose_graph()
    bop, ridx = build_banded_rcm(idx, n, dtype=jnp.float64)
    wj = jnp.asarray(w, jnp.float64)
    BD = assemble_bd(bop, wj)
    _, st0 = make_banded_precond(bop, BD, w=wj, return_state=True)

    # Perturb the weights; carry st0 forward under each protocol.
    w2 = wj * 1.05
    BD2 = assemble_bd(bop, w2)
    _, st_ref = make_banded_precond(
        bop, BD2, w=w2, prev_state=st0, use_prev=jnp.asarray(True),
        return_state=True)
    _, st_rb = make_banded_precond(
        bop, BD2, w=w2, prev_state=st0, use_prev=jnp.asarray(True),
        rebuild=jnp.asarray(True), return_state=True)
    M_skip, st_skip = make_banded_precond(
        bop, BD2, w=w2, prev_state=st0, use_prev=jnp.asarray(True),
        rebuild=jnp.asarray(False), return_state=True)

    # rebuild=True differs from rebuild=None only by lax.cond nesting
    # (different XLA fusion, same math).
    np.testing.assert_allclose(np.asarray(st_rb.Lc_inv),
                               np.asarray(st_ref.Lc_inv),
                               rtol=1e-8, atol=1e-12)
    np.testing.assert_array_equal(np.asarray(st_skip.Lc_inv),
                                  np.asarray(st0.Lc_inv))
    assert isinstance(st_skip, PrecondState)

    # The chain LDL factor rides the same gate: skipped steps carry the
    # previous factor verbatim; rebuild=True refactors against w2.
    np.testing.assert_array_equal(np.asarray(st_skip.chain_dp),
                                  np.asarray(st0.chain_dp))
    np.testing.assert_array_equal(np.asarray(st_skip.chain_l),
                                  np.asarray(st0.chain_l))
    np.testing.assert_allclose(np.asarray(st_rb.chain_dp),
                               np.asarray(st_ref.chain_dp),
                               rtol=1e-8, atol=1e-12)
    assert float(jnp.max(jnp.abs(st_rb.chain_dp - st0.chain_dp))) > 0.0

    # The skip-step preconditioner (stale factor + stale coarse inverse —
    # a gamma-sized perturbation) remains symmetric positive definite.
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.normal(size=(n, 1)))
    y = jnp.asarray(rng.normal(size=(n, 1)))
    ip1 = float(jnp.sum(M_skip(x) * y))
    ip2 = float(jnp.sum(x * M_skip(y)))
    assert abs(ip1 - ip2) < 1e-8 * max(abs(ip1), 1.0)
    assert float(jnp.sum(x * M_skip(x))) > 0.0


def test_fiedler_pair_with_banded_matches_dense():
    from mac_tpu.ops.lobpcg import dense_fiedler
    from mac_tpu.ops.laplacian import lap_dense
    from mac_tpu.utils.fiedler import fiedler_pair_op

    idx, w, n = _pose_graph(n=640, n_loops=200)
    bop, ridx = build_banded_rcm(idx, n, dtype=jnp.float64)
    assert bop is not None
    op = build_operator(ridx, n, mode="ell")
    wj = jnp.asarray(w, jnp.float64)
    rng = np.random.RandomState(7)
    X0 = jnp.asarray(rng.normal(size=(n, 4)))
    res = fiedler_pair_op(op, wj, X0, tol=1e-10, maxiter=300,
                          inner_iters=16, banded=bop)
    exact = dense_fiedler(lap_dense(build_operator(ridx, n, mode="dense"), wj), 4)
    assert abs(float(res.lam[0]) - float(exact.lam[0])) < 1e-8 * float(exact.lam[0]) + 1e-12
