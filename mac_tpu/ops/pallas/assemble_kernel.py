"""Fused Pallas TPU kernel for the block-banded Laplacian assembly.

The XLA assembly (mac_tpu.ops.banded.assemble_bd) materializes the sheared
band matrix Sh (n_pad, BS*(half+2)) in HBM across ~du compare-accumulate
passes and then re-reads it to slice/stack the upper block diagonals —
~2 ms per Frank-Wolfe weight update on city10000, i.e. a third of the
fixed per-FW-step cost at the round-3 policy's 40 cheap steps. This
kernel builds each node block's sheared rows in VMEM scratch-space and
writes the (half+1, nb, BS, BS) upper-diagonal tensor directly: HBM
traffic drops from ~du reads+writes of Sh to one write of `up` plus the
tiny weight/column tables.

Layout per grid step b (one 128-node block), TRANSPOSED orientation
(nodes on the LANE axis — round 4: the row-major (BS, du) layout forced
a pad of du to 128 lanes, 16x wasted gather output + VMEM traffic,
577+ us/FW-step on city10000):
    wu_ref   (du_pad8, BS) f32   — gathered -w per upper-neighbor slot
    dcol_ref (du_pad8, BS) int32 — static sheared target column per slot,
                                   BS + (j - i) + (i % BS); 0 for padding
                                   (never matches: real columns are > BS)
    ut_ref   (half+1, 1, BS, BS) — ut[t][b][c][r] = L[bBS+r, (b+t)BS+c]
                                   (the TRANSPOSED upper block diagonals
                                   consumed by mac_tpu.ops.banded)

The du compare-accumulate passes are statically unrolled over a
(W = BS*(half+2), BS) scratch — du is the max upper degree (~10-25 on
pose graphs) and half+1 is 2-4 block diagonals, well under the unroll
budget that crashes the remote Mosaic compiler (observed at 64+ ops).
Each pass broadcasts a (1, BS) slot row along sublanes: no in-kernel
transposes or reshapes (both unsupported/wrong on Mosaic).

Reference role: this is the weight-update step of the L(x) rebuild the
reference performs with scipy COO assembly every FW iteration
(mac/solvers/mac.py:74-89, mac/utils/graphs.py:58-98).
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BS = 128  # node-block size (must match mac_tpu.ops.banded.BS)


def _assemble_kernel(dcol_ref, wu_ref, ut_ref, *, du: int, half: int):
    W = BS * (half + 2)
    rows = jax.lax.broadcasted_iota(jnp.int32, (W, BS), 0)
    sht = jnp.zeros((W, BS), wu_ref.dtype)
    for k in range(du):
        w_k = wu_ref[k:k + 1, :]        # (1, BS)
        c_k = dcol_ref[k:k + 1, :]      # (1, BS)
        sht = sht + w_k * (c_k == rows)
    for t in range(half + 1):
        ut_ref[t, 0] = sht[BS * (t + 1): BS * (t + 2), :]


def _assemble_kernel_ov(ocol_ref, olane_ref, ow_ref, dcol_ref, wu_ref,
                        ut_ref, *, du: int, half: int, ov: int):
    """Dense slot passes + per-block overflow one-hots (see
    assemble_ut_fused_ov). The overflow tables live in SMEM (scalar
    prefetch): ~du-dense passes read their (1, BS) slot rows from VMEM as
    before, then each of the <= ov overflow entries for THIS block adds
    w * onehot(row == col, lane == node) over the (W, BS) scratch —
    scalar SMEM reads at static slot indices, no gathers, no dynamic
    vector indexing."""
    b = pl.program_id(0)
    W = BS * (half + 2)
    rows = jax.lax.broadcasted_iota(jnp.int32, (W, BS), 0)
    sht = jnp.zeros((W, BS), wu_ref.dtype)
    for k in range(du):
        w_k = wu_ref[k:k + 1, :]        # (1, BS)
        c_k = dcol_ref[k:k + 1, :]      # (1, BS)
        sht = sht + w_k * (c_k == rows)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (W, BS), 1)
    for q in range(ov):
        c_q = ocol_ref[q, b]
        r_q = olane_ref[q, b]
        w_q = ow_ref[q, b]
        sht = sht + w_q * ((rows == c_q) & (lanes == r_q)).astype(sht.dtype)
    for t in range(half + 1):
        ut_ref[t, 0] = sht[BS * (t + 1): BS * (t + 2), :]


@functools.partial(jax.jit, static_argnames=("half", "nb", "interpret"))
def assemble_ut_fused(dcol_tbl: jax.Array, wu: jax.Array, *, half: int,
                      nb: int, interpret: bool = False) -> jax.Array:
    """The TRANSPOSED upper block diagonals of L(w): (half+1, nb, BS, BS)
    with ut[t][b] = L[block b, block b+t]^T.

    dcol_tbl, wu: (du, n_pad) as produced by build_banded / the weight
    gather in assemble_bd. Exact same accumulation semantics as the XLA
    sheared path (duplicate edges occupy separate slots and sum). Slot
    rows need only be padded to a sublane multiple (8), not to 128 lanes
    — the win over the row-major variant this replaced.
    """
    du, n_pad = wu.shape
    assert n_pad == nb * BS
    du_pad = -(-du // 8) * 8
    if du_pad != du:
        wu = jnp.pad(wu, ((0, du_pad - du), (0, 0)))
        dcol_tbl = jnp.pad(dcol_tbl, ((0, du_pad - du), (0, 0)))
    # Index-map literals MUST be int32: x64 is enabled at import, so a
    # bare Python 0 traces as i64 and Mosaic fails to legalize the index
    # map's func.return (measured on the real TPU: "failed to legalize
    # operation 'func.return' ... (i32, i64)").
    z = np.int32(0)
    return pl.pallas_call(
        functools.partial(_assemble_kernel, du=du, half=half),
        grid=(nb,),
        out_shape=jax.ShapeDtypeStruct((half + 1, nb, BS, BS), wu.dtype),
        in_specs=[
            pl.BlockSpec((du_pad, BS), lambda b: (z, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((du_pad, BS), lambda b: (z, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((half + 1, 1, BS, BS),
                               lambda b: (z, b, z, z),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(dcol_tbl, wu)


@functools.partial(jax.jit,
                   static_argnames=("half", "nb", "interpret"))
def assemble_ut_fused_ov(dcol_tbl: jax.Array, wu: jax.Array,
                         ocol: jax.Array, olane: jax.Array, ow: jax.Array,
                         *, half: int, nb: int,
                         interpret: bool = False) -> jax.Array:
    """Overflow-split variant of assemble_ut_fused (round 5).

    The per-FW-step HBM cost of the assembly is the weight gather
    w_pad[ueid_tbl]: output-size bound at ~72 us per (1, n_pad) slot row
    on city10000 (577 us at du=8). Node upper-degrees are heavy-tailed
    (slot occupancy 9999/6444/3012/958/217/48/8/1), so the last slots pay
    a full n_pad-wide gather row for a handful of real edges. This
    variant gathers only the du_dense dominant slots and routes the tail
    (~274 edges at du_dense=4, 57 at 5) through tiny per-block SMEM
    tables applied INSIDE the kernel — the round-5 XLA scatter attempt
    lost end-to-end because it broke fusion with the degree reduction
    (BASELINE.md, probe_r5_gather.py); in-kernel the accumulation stays
    one program.

    dcol_tbl, wu: (du_dense, n_pad) dense slot tables (slices of the full
    tables — slots are occupancy-ranked). ocol/olane/ow: (ov, nb) SMEM
    overflow tables — sheared target column, node lane, gathered -w
    (padding entries carry w=0). Accumulation order differs from the
    all-slots kernel ONLY on overflow nodes (dense slots first, then
    overflow), an f32 reorder of <= ov addends per affected element.
    """
    du, n_pad = wu.shape
    assert n_pad == nb * BS
    ov = ocol.shape[0]
    assert ocol.shape == olane.shape == ow.shape == (ov, nb)
    du_pad = -(-du // 8) * 8
    if du_pad != du:
        wu = jnp.pad(wu, ((0, du_pad - du), (0, 0)))
        dcol_tbl = jnp.pad(dcol_tbl, ((0, du_pad - du), (0, 0)))
    z = np.int32(0)  # index-map literals must be int32 (see above)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((du_pad, BS), lambda b, *_: (z, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((du_pad, BS), lambda b, *_: (z, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((half + 1, 1, BS, BS),
                               lambda b, *_: (z, b, z, z),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_assemble_kernel_ov, du=du, half=half, ov=ov),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((half + 1, nb, BS, BS), wu.dtype),
        interpret=interpret,
    )(ocol, olane, ow, dcol_tbl, wu)
