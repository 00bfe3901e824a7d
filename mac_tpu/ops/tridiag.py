"""Parallel symmetric tridiagonal solver via associative scans.

This is the TPU-native stand-in for a sparse direct factorization: the
tridiagonal part of a pose-graph Laplacian (full diagonal + the odometry
chain's off-diagonals) captures most of its ill-conditioning, and an SPD
tridiagonal system solves in O(log n) depth with three
`jax.lax.associative_scan` passes:

  1. LDL^T pivots d'_i = d_i - e_{i-1}^2 / d'_{i-1}: a continued-fraction
     (Moebius) recurrence, composed projectively as normalized 2x2 matrix
     products.
  2. Unit-lower forward substitution y_i = b_i - l_i y_{i-1}: an affine
     recurrence scan.
  3. Backward substitution on L^T: the same scan reversed.

Replaces the role of CHOLMOD/SuperLU factorizations in the reference
(mac/utils/cholesky.py:107-134; SuperLU inside NetworkX tracemin at
mac/utils/fiedler.py:42) as the preconditioner backbone for the eigensolver
and CG (see mac_tpu.ops.lobpcg / mac_tpu.ops.cg).
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


FORCE_SCAN = False  # see tridiag_solve_factored_fast


class TridiagFactor:
    """LDL^T factor of an SPD tridiagonal matrix: T = L diag(dp) L^T with
    unit-lower-bidiagonal L, subdiagonal l.

    `seg` records how the factor was produced: None = exact factorization
    (tridiag_ldl); an integer = segment-decoupled approximate factor with
    couplings zeroed at every `seg` boundary (tridiag_ldl_blocked). Solvers
    use it to decide which fused kernels are VALID for this factor rather
    than inferring from n (a caller passing an exact factor at large n must
    never be routed through a segment-decoupling kernel). `seg` is pytree
    aux data (static), so it participates in jit cache keys, not tracing."""

    __slots__ = ("dp", "l", "seg")

    def __init__(self, dp: jax.Array, l: jax.Array,
                 seg: Optional[int] = None):
        self.dp = dp  # (n,) pivots
        self.l = l    # (n,) subdiagonal of L; l[0] = 0
        self.seg = seg

    def __repr__(self):
        return f"TridiagFactor(dp={self.dp!r}, l={self.l!r}, seg={self.seg})"


jax.tree_util.register_pytree_node(
    TridiagFactor,
    lambda f: ((f.dp, f.l), f.seg),
    lambda seg, children: TridiagFactor(*children, seg=seg),
)


def _mobius_combine(a, b):
    """Compose projective 2x2 maps (normalized to avoid over/underflow).

    Operands are (..., 2, 2); `b` follows `a` in sequence order, i.e. the
    composite is b @ a.
    """
    m = jnp.einsum("...ij,...jk->...ik", b, a)
    scale = jnp.max(jnp.abs(m), axis=(-2, -1), keepdims=True)
    scale = jnp.where(scale == 0, 1.0, scale)
    return m / scale


def _affine_combine(a, b):
    """Compose affine recurrences y -> coef*y + off; b follows a."""
    ca, oa = a
    cb, ob = b
    return (cb * ca, cb * oa + ob)


def tridiag_ldl(d: jax.Array, e: jax.Array) -> TridiagFactor:
    """LDL^T pivots of the SPD tridiagonal matrix with diagonal d (n,) and
    off-diagonal e (n-1,). O(log n) depth via a projective scan.

    The scan always runs in float64 and the factor is returned in the input
    dtype: the projective (Moebius) composition spans a wide dynamic range,
    and on TPU (flush-to-zero float32) it was observed to produce
    non-finite pivots on real pose-graph weight scales where the identical
    float32 computation on CPU stays finite. The factorization runs once
    per weight vector — the float64 cost is negligible next to the solves.
    """
    out_dtype = d.dtype
    d = d.astype(jnp.float64)
    e = e.astype(jnp.float64)
    n = d.shape[0]
    e2 = jnp.concatenate([jnp.zeros((1,), d.dtype), e * e])  # e2[i] = e_{i-1}^2
    # x_i = d_i - e2_i / x_{i-1}  as  [[d_i, -e2_i], [1, 0]] acting projectively.
    M = jnp.stack(
        [
            jnp.stack([d, -e2], axis=-1),
            jnp.stack([jnp.ones_like(d), jnp.zeros_like(d)], axis=-1),
        ],
        axis=-2,
    )  # (n, 2, 2)
    P = jax.lax.associative_scan(_mobius_combine, M, axis=0)
    # Applied to [1, 0]: x_i = P[i,0,0] / P[i,1,0].
    dp = P[:, 0, 0] / P[:, 1, 0]
    # Pivot clamp: for a near-singular tridiagonal (a pure odometry chain's
    # Laplacian regularized by a tiny shift) the float32 scan can round
    # pivots to ~0 or below, which poisons the solve with inf/NaN. The
    # factor is a preconditioner, so flooring pivots at a small positive
    # multiple of the diagonal scale is safe and keeps it SPD.
    floor = 8 * jnp.finfo(out_dtype).eps * jnp.max(d)
    dp = jnp.maximum(dp, floor)
    l = jnp.concatenate([jnp.zeros((1,), d.dtype), e / dp[:-1]])
    return TridiagFactor(dp=dp.astype(out_dtype), l=l.astype(out_dtype))


def tridiag_ldl_blocked(d: jax.Array, e: jax.Array,
                        block: int = 1024) -> TridiagFactor:
    """Blocked LDL^T: factor `block`-sized chain segments independently
    (couplings across segment boundaries dropped — the factor is a
    *preconditioner*, and a two-grid coarse level owns the global modes).

    Why this exists: `tridiag_ldl`'s associative scan unrolls log2(n)
    stages of large slices, which stalls the remote XLA compile beyond
    n ~ 3e4 (BASELINE.md round-1). Here the recurrence runs as ONE rolled
    `lax.scan` of length `block`, vectorized across the n/block segments —
    compile size is independent of n. Runs in float64 like tridiag_ldl
    (same flush-to-zero rationale; the scan state is tiny).
    """
    out_dtype = d.dtype
    n = d.shape[0]
    nb = -(-n // block)
    n_pad = nb * block
    d64 = jnp.concatenate(
        [d, jnp.ones((n_pad - n,), d.dtype)]).astype(jnp.float64)
    # e2[i] couples i to i-1; zero at segment starts (and padding).
    e2 = jnp.concatenate(
        [jnp.zeros((1,), jnp.float64),
         (e * e).astype(jnp.float64),
         jnp.zeros((n_pad - n,), jnp.float64)])
    pos = jnp.arange(n_pad) % block
    e2 = jnp.where(pos == 0, 0.0, e2)
    dB = d64.reshape(nb, block)
    eB = e2.reshape(nb, block)

    def step(prev_dp, de):
        di, e2i = de
        dp = di - e2i / prev_dp
        return dp, dp

    _, dpB = jax.lax.scan(
        step, jnp.ones((nb,), jnp.float64), (dB.T, eB.T))
    dp = dpB.T.reshape(n_pad)[:n]
    floor = 8 * jnp.finfo(out_dtype).eps * jnp.max(d.astype(jnp.float64))
    dp = jnp.maximum(dp, floor)
    e_eff = jnp.where((jnp.arange(1, n) % block) == 0, 0.0,
                      e.astype(jnp.float64)) if n > 1 else e.astype(jnp.float64)
    l = jnp.concatenate([jnp.zeros((1,), jnp.float64), e_eff / dp[:-1]])
    return TridiagFactor(dp=dp.astype(out_dtype), l=l.astype(out_dtype),
                         seg=int(block))


# Beyond this size the associative-scan factorization's unrolled stages
# stall the (remote) XLA compile; use the blocked variant.
TRIDIAG_SCAN_MAX_N = 32768


def tridiag_ldl_auto(d: jax.Array, e: jax.Array) -> TridiagFactor:
    """tridiag_ldl for sizes the scan compiles comfortably; the blocked
    segment factorization beyond (preconditioner-grade)."""
    if d.shape[0] <= TRIDIAG_SCAN_MAX_N:
        return tridiag_ldl(d, e)
    return tridiag_ldl_blocked(d, e)


def tridiag_solve_factored(f: TridiagFactor, B: jax.Array) -> jax.Array:
    """Solve T X = B given the LDL^T factor; B is (n, q)."""
    l = f.l[:, None]
    # Forward: y_i = b_i - l_i y_{i-1}.
    coef = jnp.broadcast_to(-l, B.shape)
    _, y = jax.lax.associative_scan(_affine_combine, (coef, B), axis=0)
    z = y / f.dp[:, None]
    # Backward: x_i = z_i - l_{i+1} x_{i+1}: reverse affine scan.
    lr = jnp.concatenate([-f.l[1:], jnp.zeros((1,), f.l.dtype)])[:, None]
    coef_r = jnp.broadcast_to(lr, B.shape)[::-1]
    _, xr = jax.lax.associative_scan(_affine_combine, (coef_r, z[::-1]), axis=0)
    return xr[::-1]


def tridiag_solve(d: jax.Array, e: jax.Array, B: jax.Array) -> jax.Array:
    """Solve the SPD tridiagonal system (diag d, off-diag e) against (n, q)."""
    return tridiag_solve_factored(tridiag_ldl(d, e), B)


@jax.custom_batching.custom_vmap
def _fused_solve_whole(dp: jax.Array, l: jax.Array, B: jax.Array) -> jax.Array:
    from mac_tpu.ops.pallas.tridiag_kernel import tridiag_solve_fused

    return tridiag_solve_fused(dp, l, B)


@jax.custom_batching.custom_vmap
def _fused_solve_blocked(dp: jax.Array, l: jax.Array, B: jax.Array) -> jax.Array:
    from mac_tpu.ops.pallas.tridiag_kernel import tridiag_solve_fused_blocked

    return tridiag_solve_fused_blocked(dp, l, B, block=1024)


def _scan_solve_batch_rule(axis_size, in_batched, dp, l, B):
    """Batched (vmapped) fused solves fall back to the associative-scan
    path: Mosaic cannot lower the Pallas kernel under vmap's loop batching
    ('failed to legalize func.return', observed when solve_sweep vmapped
    the banded preconditioner), and the scan path vmaps natively."""
    bd, bl, bB = in_batched
    fn = lambda d_, l_, B_: tridiag_solve_factored(TridiagFactor(d_, l_), B_)
    out = jax.vmap(fn, in_axes=(0 if bd else None, 0 if bl else None,
                                0 if bB else None))(dp, l, B)
    return out, True


_fused_solve_whole.def_vmap(_scan_solve_batch_rule)
_fused_solve_blocked.def_vmap(_scan_solve_batch_rule)


def tridiag_solve_factored_fast(f: TridiagFactor, B: jax.Array) -> jax.Array:
    """Backend-dispatched solve: the fused Pallas kernel on TPU (one kernel
    instead of ~30 scan stages — this sits in the eigensolver's innermost
    loop), the associative-scan path elsewhere. float64 blocks (automatic
    precision escalation) stay on the scan path: TPU XLA cannot rewrite
    x64 types through a Pallas custom call. Under vmap (budget sweeps) the
    kernels fall back to the scan path via a custom_vmap rule.

    FORCE_SCAN (module flag, read at trace time) pins the scan path
    everywhere — an A/B instrument for the layout-copy question: the
    round-5 city10000 trace shows ~12 XLA `copy` ops (~47 us) per inner-CG
    iteration bracketing the two Pallas custom calls (XLA cannot relayout
    through a custom call), ~10x the kernels' own 2 x 4.9 us compute."""
    if FORCE_SCAN:
        return tridiag_solve_factored(f, B)
    # Narrow blocks only: the kernel holds the whole (q_pad, n_pad) block in
    # VMEM, which is right for eigensolver blocks (q <= ~16) but OOMs for
    # the wide multi-RHS chunks of GreedyESP's batched solves.
    if (
        jax.default_backend() == "tpu"
        and B.dtype == jnp.float32
        and B.shape[1] <= 32
    ):
        n, q = B.shape
        if n <= TRIDIAG_SCAN_MAX_N:
            return _fused_solve_whole(
                f.dp.astype(B.dtype), f.l.astype(B.dtype), B)
        # Beyond the whole-row kernel's VMEM budget (measured OOM at
        # n = 1e5): segment-decoupled variant. Valid ONLY for factors that
        # are already segment-decoupled at 1024 boundaries (f.seg recorded
        # at factorization time divides 1024) — an exact factor must never
        # be routed through the decoupling kernel, which would silently
        # zero its couplings (ADVICE r2 #3).
        # VMEM is n-independent since the kernel grids over 256-row
        # chunks (tridiag_solve_fused_blocked), so the only requirement
        # is a factor already segment-decoupled at 1024 boundaries. (The
        # old whole-stack-in-VMEM 12 MB bound silently disabled the
        # kernel for every n >= ~1e5, leaving the chain preconditioner on
        # the ~30-stage scan path: 55.7 ms/solve at n=3e5, TPU-measured.)
        if (
            f.seg is not None
            and 1024 % int(f.seg) == 0
        ):
            return _fused_solve_blocked(
                f.dp.astype(B.dtype), f.l.astype(B.dtype), B)
    return tridiag_solve_factored(f, B)
