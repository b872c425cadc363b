"""Deferred rank-2M landmark-grid pass as ONE fused Pallas kernel.

This is the op that dominates config-4 runtime (the blocked EKF's only
O(N^2) state is the landmark grid; reference analog: the dense
``(I - K H) Sigma`` of slam_library.cpp:263-282 executed M times per tick).
The deferred step (parallel/blocked_ekf.py) reduces M grid passes to one:

    grid' = replay_overwrites(grid, init ops) - Kmask @ HSmask^T

where the replay applies each tick-buffered landmark-init's row/column
overwrite in op order (last writer wins) and the masked rank-2M term
subtracts every *later* Kalman update's outer product. XLA schedules this
as (a) a (2Nl, 2M) x (2M, 2N) matmul materializing a grid-sized ``sub``
buffer and (b) a fused select-subtract pass — i.e. ~2 reads + 2 writes of
the grid. This kernel fuses everything into a single read + write: per row
tile it applies the (static-M, unrolled) overwrite selects in VMEM and
subtracts the MXU outer product before the one store — HBM traffic drops
from ~4 to the 2-pass floor.

Layout notes (see BENCH_NOTES pathologies 9/11): all operands arrive
pre-flattened with the landmark axes on lanes — grid (2Nl, 2N), masked
gains ``a`` (2Nl, 2M), masked H-Sigma strips ``b`` (2M, 2N), init row
strips ``crow`` (2M, 2N), init column strips ``ccol`` (2Nl, 2M) — so the
within-block (2, 2) structure is carried by row/column parity, handled
in-kernel with iota-parity selects (a (TC//2, 2) lane reshape would send
Mosaic into relayouts).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PREC = jax.lax.Precision.HIGHEST


def _make_kernel(M: int):
    def kernel(cov_ref, a_ref, b_ref, crow_ref, ccol_ref, rowt_ref,
               colt_ref, out_ref):
        base = cov_ref[:]
        TR, TC = base.shape
        rt = rowt_ref[:]                                       # (TR, 1)
        ct = colt_ref[:]                                       # (1, TC)
        # within-block component index = row/col parity (tiles are even)
        rpar = jax.lax.broadcasted_iota(jnp.int32, (TR, 1), 0) % 2
        cpar = jax.lax.broadcasted_iota(jnp.int32, (1, TC), 1) % 2
        for i in range(M):
            # column overwrite first, then row: ops replay in ascending
            # order so the LAST init touching an entry wins, and at an op's
            # own (slot, slot) block the row pass lands the exact B_own
            # (the column pass would land its 1-ulp transpose)
            cc = ccol_ref[:, 2 * i:2 * i + 2]                  # (TR, 2)
            cv = jnp.where(cpar == 0, cc[:, 0:1], cc[:, 1:2])  # (TR, TC)
            base = jnp.where(ct == i, cv, base)
            cr = crow_ref[2 * i:2 * i + 2, :]                  # (2, TC)
            rv = jnp.where(rpar == 0, cr[0:1, :], cr[1:2, :])  # (TR, TC)
            base = jnp.where(rt == i, rv, base)
        out_ref[:] = base - jnp.dot(
            a_ref[:], b_ref[:], preferred_element_type=jnp.float32,
            precision=PREC)
    return kernel


def _pick_tile(n: int, cap: int) -> int:
    """Largest even divisor of n that is <= cap (n is even)."""
    t = min(n, cap)
    while t > 2:
        if n % t == 0 and t % 2 == 0:
            return t
        t -= 2
    return 2


def grid_shapes_supported(two_nl: int, two_n: int) -> bool:
    """The kernel wants lane-aligned flat shapes: columns a multiple of
    128 and rows a multiple of 8 (f32 tiles). Callers fall back to the XLA
    schedule otherwise (tiny test meshes)."""
    return two_n % 128 == 0 and two_nl % 8 == 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_grid_update(cov, a, b, crow, ccol, rowt, colt,
                      interpret: bool = False):
    """One fused pass: replay init overwrites, subtract the rank-2M term.

    cov  (2Nl, 2N) f32   local grid rows, flattened
    a    (2Nl, 2M)       row-masked Kalman gains (Kmask, flattened)
    b    (2M, 2N)        col-masked H-Sigma strips (HSmask, flattened)
    crow (2M, 2N)        gathered init cross strips (row overwrite values)
    ccol (2Nl, 2M)       local init cross columns (column overwrite values)
    rowt (2Nl,) int32    per-row last-init op index (-1 = none), repeated x2
    colt (2N,)  int32    per-column last-init op index, repeated x2

    Exact-arithmetic-equal to the XLA reference below; in f32 only the
    matmul accumulation order differs.
    """
    R2, C2 = cov.shape
    M2 = a.shape[1]
    assert grid_shapes_supported(R2, C2), (R2, C2)
    TR = _pick_tile(R2, 256)
    TC = _pick_tile(C2, 2048)
    grid = (R2 // TR, C2 // TC)

    return pl.pallas_call(
        _make_kernel(M2 // 2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TR, TC), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),             # cov tile
            pl.BlockSpec((TR, M2), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),             # Kmask rows
            pl.BlockSpec((M2, TC), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),             # HSmask cols
            pl.BlockSpec((M2, TC), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),             # crow cols
            pl.BlockSpec((TR, M2), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),             # ccol rows
            pl.BlockSpec((TR, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),             # rowT
            pl.BlockSpec((1, TC), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),             # colT
        ],
        out_specs=pl.BlockSpec((TR, TC), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R2, C2), cov.dtype),
        input_output_aliases={0: 0},
        interpret=interpret,
    )(cov, a, b, crow, ccol, rowt.reshape(R2, 1), colt.reshape(1, C2))


def reference_grid_update(cov, a, b, crow, ccol, rowt, colt):
    """XLA oracle for the same math (also the CPU/f64 fallback schedule)."""
    M2 = a.shape[1]
    rt = rowt[:, None]
    ct = colt[None, :]
    rpar = (jnp.arange(cov.shape[0]) % 2)[:, None]
    cpar = (jnp.arange(cov.shape[1]) % 2)[None, :]
    base = cov
    for i in range(M2 // 2):
        cc = ccol[:, 2 * i:2 * i + 2]
        cv = jnp.where(cpar == 0, cc[:, 0:1], cc[:, 1:2])
        base = jnp.where(ct == i, cv, base)
        cr = crow[2 * i:2 * i + 2, :]
        rv = jnp.where(rpar == 0, cr[0:1, :], cr[1:2, :])
        base = jnp.where(rt == i, rv, base)
    return base - jnp.matmul(a, b, precision=PREC)
