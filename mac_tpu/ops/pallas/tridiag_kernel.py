"""Fused Pallas TPU kernel for the tridiagonal LDL^T solve.

The XLA path (mac_tpu.ops.tridiag.tridiag_solve_factored) lowers each
associative scan to ~13 slice/compose stages, so one solve costs ~30 small
kernels — the dominant op-count (latency) term of the whole eigensolver on
TPU. This kernel runs both substitution scans and the diagonal scale in a
single `pallas_call` with everything VMEM-resident.

Layout: lane-major (q_pad, n_pad) — the scan axis lives on lanes, so each
Hillis-Steele step is one `pltpu.roll` + masked select on the VPU; a
(8, 16384) f32 block is ~512 KB of VMEM. Affine recurrences
    forward:  y_i = b_i - l_i * y_{i-1}
    backward: x_i = z_i - l_{i+1} * x_{i+1}
compose as (coef, val) pairs: (c2, v2) after (c1, v1) = (c2*c1, v2 + c2*v1).

Padding contract (caller): rows n..n_pad-1 must carry l = 0, dp = 1,
B = 0 — the zero sub/super-diagonal decouples the padded tail.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roll(x, k: int, axis: int):
    """pltpu.roll with an explicit int32 shift (under jax_enable_x64 a bare
    Python int lowers to an i64 scalar, which tpu.dynamic_rotate rejects)."""
    return pltpu.roll(x, jnp.asarray(k, jnp.int32), axis)


def _scan_steps(n: int):
    steps = []
    k = 1
    while k < n:
        steps.append(k)
        k *= 2
    return steps


def _tridiag_kernel(dp_ref, l_ref, b_ref, out_ref, *, n_pad: int):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
    l = l_ref[:]            # (1, n_pad)
    dp = dp_ref[:]          # (1, n_pad)
    v = b_ref[:]            # (q_pad, n_pad)

    # Forward substitution: y_i = b_i - l_i y_{i-1}.
    c = -l
    for k in _scan_steps(n_pad):
        c_prev = _roll(c, k, 1)
        v_prev = _roll(v, k, 1)
        valid = lane >= k
        v = jnp.where(valid, v + c * v_prev, v)
        c = jnp.where(valid, c * c_prev, c)

    # Diagonal scale.
    v = v / dp

    # Backward substitution: x_i = z_i - l_{i+1} x_{i+1}.
    # (pltpu.roll requires non-negative shifts: roll by n_pad - k == -k.)
    c = -_roll(l, n_pad - 1, 1)
    c = jnp.where(lane == n_pad - 1, 0.0, c)
    for k in _scan_steps(n_pad):
        c_next = _roll(c, n_pad - k, 1)
        v_next = _roll(v, n_pad - k, 1)
        valid = lane < n_pad - k
        v = jnp.where(valid, v + c * v_next, v)
        c = jnp.where(valid, c * c_next, c)

    out_ref[:] = v


@functools.partial(jax.jit, static_argnames=("interpret",))
def tridiag_solve_fused(dp: jax.Array, l: jax.Array, B: jax.Array,
                        interpret: bool = False) -> jax.Array:
    """Solve L diag(dp) L^T X = B with unit-lower-bidiagonal L (subdiag l).

    dp, l: (n,); B: (n, q). One fused Pallas kernel; returns (n, q).
    """
    n, q = B.shape
    n_pad = max(128, -(-n // 128) * 128)
    q_pad = max(8, -(-q // 8) * 8)
    dtype = B.dtype

    dp_p = jnp.ones((1, n_pad), dtype).at[0, :n].set(dp.astype(dtype))
    l_p = jnp.zeros((1, n_pad), dtype).at[0, :n].set(l.astype(dtype))
    b_p = jnp.zeros((q_pad, n_pad), dtype).at[:q, :n].set(B.T)

    out = pl.pallas_call(
        functools.partial(_tridiag_kernel, n_pad=n_pad),
        out_shape=jax.ShapeDtypeStruct((q_pad, n_pad), dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(dp_p, l_p, b_p)
    return out[:q, :n].T


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def tridiag_solve_fused_blocked(dp: jax.Array, l: jax.Array, B: jax.Array,
                                block: int = 1024,
                                interpret: bool = False) -> jax.Array:
    """Segment-decoupled fused solve for factors from
    `tridiag_ldl_blocked` (l = 0 at every `block` boundary, so segments
    solve independently — enforced defensively here).

    The whole-row kernel holds (q_pad + 3) full rows of n_pad lanes in
    VMEM, which blows the ~16 MB budget past n ~ 3e4 (measured OOM at
    n = 1e5: 30.9 MB). This variant reshapes to (q * n/block, block):
    same Hillis-Steele lane scans, VMEM independent of n. `block` must be
    a multiple of the factor's segment length (zeroed boundaries compose).
    """
    n, q = B.shape
    nbl = -(-n // block)
    n_pad = nbl * block
    dtype = B.dtype
    pos = jnp.arange(n_pad) % block

    dp_p = jnp.ones((n_pad,), dtype).at[:n].set(dp.astype(dtype))
    l_p = jnp.zeros((n_pad,), dtype).at[:n].set(l.astype(dtype))
    l_p = jnp.where(pos == 0, 0.0, l_p)  # decouple segments
    dp_b = jnp.tile(dp_p.reshape(nbl, block), (q, 1))      # (q*nbl, block)
    l_b = jnp.tile(l_p.reshape(nbl, block), (q, 1))
    b_p = jnp.concatenate(
        [B, jnp.zeros((n_pad - n, q), dtype)], axis=0)
    b_b = b_p.T.reshape(q * nbl, block)

    # Row tiling: each (segment, rhs-column) row is independent, so grid
    # the kernel over ROWTILE-row chunks — VMEM per step is 4 buffers x
    # ROWTILE x block x 4 B = 4 MB, INDEPENDENT of n and q. Without the
    # grid the whole (q*nbl, block) stack must fit VMEM, which capped
    # engagement at n ~ 1e5 (q=4: 18.4 MB > the ~12 MB budget) and left
    # large-n chain-preconditioner solves on the ~30-stage scan path
    # (measured 55.7 ms/solve at n=3e5 on TPU, round 4).
    rows = q * nbl
    ROWTILE = 256
    unit = ROWTILE if rows > ROWTILE else 8
    rows_pad = -(-rows // unit) * unit
    if rows_pad != rows:
        z = jnp.zeros((rows_pad - rows, block), dtype)
        dp_b = jnp.concatenate([dp_b, jnp.ones_like(z)], axis=0)
        l_b = jnp.concatenate([l_b, z], axis=0)
        b_b = jnp.concatenate([b_b, z], axis=0)

    zi = np.int32(0)  # index-map literals must be int32 under x64
    out = pl.pallas_call(
        functools.partial(_tridiag_kernel, n_pad=block),
        grid=(rows_pad // unit,),
        out_shape=jax.ShapeDtypeStruct((rows_pad, block), dtype),
        in_specs=[
            pl.BlockSpec((unit, block), lambda r: (r, zi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((unit, block), lambda r: (r, zi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((unit, block), lambda r: (r, zi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((unit, block), lambda r: (r, zi),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(dp_b, l_b, b_b)
    return out[:rows].reshape(q, n_pad)[:, :n].T
