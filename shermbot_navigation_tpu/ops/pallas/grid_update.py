"""Deferred rank-2M landmark-grid pass as ONE fused Pallas kernel.

This is the op that dominates config-4 runtime (the blocked EKF's only
O(N^2) state is the landmark grid; reference analog: the dense
``(I - K H) Sigma`` of slam_library.cpp:263-282 executed M times per tick).
The deferred step (parallel/blocked_ekf.py) reduces M grid passes to one:

    grid' = replay_overwrites(grid, init ops) - Kmask @ HSmask^T

where the replay applies each tick-buffered landmark-init's row/column
overwrite in op order (last writer wins) and the masked rank-2M term
subtracts every *later* Kalman update's outer product.

Layout (BENCH_NOTES pathology 9, applied to the grid itself): the grid is
stored as four COMPONENT PLANES ``(2, 2, Nl, N)`` — ``plane[p, q, n, m] =
Sigma[(landmark n, comp p), (landmark m, comp q)]`` — so every operand of
this pass is a large-by-large 2D array with the landmark axes on the
(sublane, lane) tile and NO interleaved size-2 dims anywhere: no relayout
copy can be induced by any consumer (the interleaved flat-(2Nl, 2N) form
used through r03 forced XLA to materialize T(2,128) relayout copies —
64x padded, ~4.3 GB per copy at N=2048 — whenever a kernel operand needed
the other layout).

Per plane (p, r) the pass is

    base = replay(cov[p, r])            # row/col overwrites, last-op wins
    out[p, r] = base - A[p] @ B[r]      # (Nl, 2M) x (2M, N) on the MXU

with A[p][n, 2i+c] = masked-gain comps and B[r][2i+c, m] = masked
H-Sigma comps — 4 small matmuls totalling the same FLOPs as the old
single flat matmul. XLA schedules the reference below as ~2 reads +
2 writes of the grid; the kernel fuses to the one-read one-write floor.
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
        base = cov_ref[...]                                    # (TR, TC)
        rt = rowt_ref[...]                                     # (TR, 1)
        ct = colt_ref[...]                                     # (1, TC)
        for i in range(M):
            # column overwrite first, then row: ops replay in ascending
            # order so the LAST init touching an entry wins, and at an op's
            # own (slot, slot) block the row pass lands the exact B_own
            # (the column pass would land its 1-ulp transpose)
            base = jnp.where(ct == i, ccol_ref[:, i:i + 1], base)
            base = jnp.where(rt == i, crow_ref[i:i + 1, :], base)
        out_ref[...] = base - jnp.dot(
            a_ref[...], b_ref[...], preferred_element_type=jnp.float32,
            precision=PREC)
    return kernel


def _pick_tile(n: int, cap: int) -> int:
    """Largest divisor of n that is <= cap."""
    t = min(n, cap)
    while t > 1:
        if n % t == 0:
            return t
        t -= 1
    return 1


def grid_shapes_supported(n_local: int, n: int) -> bool:
    """PRODUCTION routing gate: lane-aligned plane shapes (columns a
    multiple of 128, rows a multiple of 8 — full f32 tiles). The kernel
    itself also runs smaller even shapes (Mosaic pads the tile; used by
    interpret-mode tests and the dryrun), but padded lanes waste bandwidth
    so auto-routing demands alignment."""
    return n % 128 == 0 and n_local % 8 == 0


@functools.partial(jax.jit, static_argnames=("interpret", "tr_cap",
                                             "tc_cap"))
def fused_grid_update(cov, a, b, crow, ccol, rowt, colt,
                      interpret: bool = False, tr_cap: int = 256,
                      tc_cap: int = 2048):
    """One fused pass: replay init overwrites, subtract the rank-2M term.

    cov  (2, 2, Nl, N) f32  local grid rows, component planes
    a    (2, Nl, 2M)        row-masked Kalman gain comps (A[p])
    b    (2, 2M, N)         col-masked H-Sigma comps (B[r])
    crow (2, 2, M, N)       gathered init cross strips, comps [p*2+r]
                            (row overwrite values)
    ccol (2, 2, Nl, M)      local init cross columns, comps [r*2+p]
                            (column overwrite values, landmark-major)
    rowt (Nl,) int32        per-row last-init op index (-1 = none)
    colt (N,)  int32        per-column last-init op index

    Exact-arithmetic-equal to the XLA reference below; in f32 only the
    matmul accumulation order differs.
    """
    _, _, NL, N = cov.shape
    M2 = a.shape[2]
    M = M2 // 2
    assert NL % 2 == 0 and N % 2 == 0, (NL, N)
    # default caps (256, 2048) measured best in the r05 tile sweep
    # (r05_grid_tiles.json): larger row tiles need the raised scoped-vmem
    # limit and did NOT beat the default in either the VMEM or HBM regime
    TR = _pick_tile(NL, tr_cap)
    TC = _pick_tile(N, tc_cap)
    grid = (2, 2, NL // TR, N // TC)

    return pl.pallas_call(
        _make_kernel(M),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, None, TR, TC),
                         lambda p, r, i, j: (p, r, i, j),
                         memory_space=pltpu.VMEM),             # cov tile
            pl.BlockSpec((None, TR, M2), lambda p, r, i, j: (p, i, 0),
                         memory_space=pltpu.VMEM),             # A[p] rows
            pl.BlockSpec((None, M2, TC), lambda p, r, i, j: (r, 0, j),
                         memory_space=pltpu.VMEM),             # B[r] cols
            pl.BlockSpec((None, None, M, TC),
                         lambda p, r, i, j: (p, r, 0, j),
                         memory_space=pltpu.VMEM),             # crow comps
            pl.BlockSpec((None, None, TR, M),
                         lambda p, r, i, j: (p, r, i, 0),
                         memory_space=pltpu.VMEM),             # ccol comps
            pl.BlockSpec((TR, 1), lambda p, r, i, j: (i, 0),
                         memory_space=pltpu.VMEM),             # rowT
            pl.BlockSpec((1, TC), lambda p, r, i, j: (0, j),
                         memory_space=pltpu.VMEM),             # colT
        ],
        out_specs=pl.BlockSpec((None, None, TR, TC),
                               lambda p, r, i, j: (p, r, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(cov.shape, cov.dtype),
        input_output_aliases={0: 0},
        # tiles above the 16 MB Mosaic scoped-vmem default (in+out,
        # double-buffered, plus the operand strips) need the raised
        # limit; v5e has 128 MB VMEM. The margin matters: an exactly-16MB
        # tile estimate still overflows by the strip buffers (measured
        # 16.25 MB at N=8192/tr=512, r05_grid_tiles sweep)
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
            if TR * TC * 4 * 4 >= 8 * 1024 * 1024 else None),
        interpret=interpret,
    )(cov, a, b, crow, ccol, rowt.reshape(NL, 1), colt.reshape(1, N))


def reference_grid_update(cov, a, b, crow, ccol, rowt, colt):
    """XLA oracle for the same math (also the CPU/f64 fallback schedule and
    the production multi-shard schedule). Same operands as
    :func:`fused_grid_update`."""
    M = crow.shape[2]
    rt = rowt[:, None]                                         # (Nl, 1)
    ct = colt[None, :]                                         # (1, N)
    outs = []
    for p in range(2):
        row_out = []
        for r in range(2):
            base = cov[p, r]
            for i in range(M):
                base = jnp.where(ct == i, ccol[p, r, :, i:i + 1], base)
                base = jnp.where(rt == i, crow[p, r, i:i + 1, :], base)
            row_out.append(base - jnp.matmul(a[p], b[r], precision=PREC))
        outs.append(jnp.stack(row_out))
    return jnp.stack(outs)
