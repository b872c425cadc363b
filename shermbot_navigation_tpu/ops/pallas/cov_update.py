"""Fused EKF Kalman-update kernel: gain, mean shift, rank-2 covariance
downdate in one pass over HBM.

The update (ref ``update``, slam_library.cpp:263-282; sparse form in
``models.ekf_slam.update``) reduces to::

    K    = SHt @ psi_inv                  (D, 2)
    mean'= mean + K @ dz                  (D,)
    cov' = cov - K @ SHt^T                (D, D)   <- the HBM-bound part

``cov`` is touched exactly once (read + write); everything else lives in
VMEM. The kernel tiles cov rows, keeps the full ``SHt`` resident, computes
the row-tile's gain on the fly and applies the outer product — one fused
pass at HBM speed-of-light (2 x 4 x D^2 bytes moved, zero intermediate
materialization). XLA's default schedule materializes K and the (D, D)
outer product separately; at D = 4003 (config 4) that is 3 passes over
64 MB instead of 2.

Layout: every operand is LANE-ALIGNED — the measurement dim (2) lives on
the sublane axis and D on the lane axis (``sht_t`` is (2, D), ``mean`` is
(1, D)); shapes like (D, 2) would leave 126/128 lanes dead and send the
Mosaic layout engine into pathological padding. D must be a multiple of
128 (the EKF state is padded at allocation).

NOTE: ``preferred_element_type`` only pins the accumulator; the MXU still
multiplies f32 inputs in bf16 without precision=HIGHEST.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PREC = jax.lax.Precision.HIGHEST


def _kernel(cov_ref, sht_full_ref, psi_inv_ref, dz_ref, mean_ref,
            sht_tile_ref, cov_out_ref, mean_out_ref):
    """One row-tile of the fused update.

    cov_ref:      (TILE, D)  covariance row tile
    sht_full_ref: (2, D)     full (Sigma H^T)^T — resident every program
    psi_inv_ref:  (2, 2)
    dz_ref:       (1, 2)
    mean_ref:     (1, TILE)  mean slice (row layout)
    sht_tile_ref: (2, TILE)  this tile's columns of (Sigma H^T)^T
    """
    # K_tile^T = psi_inv^T @ SHt_tile^T : (2, 2) @ (2, TILE) -> (2, TILE)
    kt = jax.lax.dot_general(
        psi_inv_ref[:], sht_tile_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=PREC)
    # mean_tile += dz @ K_tile^T : (1, 2) @ (2, TILE)
    mean_out_ref[:] = mean_ref[:] + jnp.dot(
        dz_ref[:], kt, preferred_element_type=jnp.float32,
        precision=PREC).astype(mean_ref.dtype)
    # cov_tile -= K_tile @ SHt^T : contract the 2-dim of (2, TILE) x (2, D)
    cov_out_ref[:] = cov_ref[:] - jax.lax.dot_general(
        kt, sht_full_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=PREC,
    ).astype(cov_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def fused_kalman_update(cov, sht, psi_inv, dz, mean, tile: int = 512,
                        interpret: bool = False):
    """Apply the fused update. ``cov`` (D, D) with D % 128 == 0 and
    D % tile == 0; ``sht`` (D, 2); ``psi_inv`` (2, 2); ``dz`` (2,);
    ``mean`` (D,). Returns (cov', mean')."""
    D = cov.shape[0]
    assert D % 128 == 0, f"D={D} must be lane-aligned (pad to 128)"
    assert D % tile == 0, f"D={D} not divisible by tile={tile}"
    grid = (D // tile,)
    sht_t = jnp.asarray(sht).T                      # (2, D) lane-aligned

    cov_out, mean_out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),          # cov row tile
            pl.BlockSpec((2, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # SHt^T full
            pl.BlockSpec((2, 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # psi_inv
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # dz
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),          # mean row tile
            pl.BlockSpec((2, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),          # SHt^T col tile
        ],
        out_specs=[
            pl.BlockSpec((tile, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((D, D), cov.dtype),
            jax.ShapeDtypeStruct((1, D), mean.dtype),
        ],
        input_output_aliases={0: 0},
        # the 16 MB Mosaic scoped-vmem default rejects the D=4096
        # serving shape at tile=512 (in+out double-buffered row tiles =
        # 32 MB; r04 compile failure); v5e has 128 MB VMEM per core, so
        # raise the limit rather than shrink the tile (large tiles
        # amortize the per-program overhead better)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(cov, sht_t, psi_inv, jnp.asarray(dz).reshape(1, 2),
      jnp.asarray(mean).reshape(1, D), sht_t)
    return cov_out, mean_out[0, :]


def reference_kalman_update(cov, sht, psi_inv, dz, mean):
    """XLA reference for the same math (test oracle / fallback)."""
    K = jnp.matmul(sht, psi_inv, precision=PREC)
    return (cov - jnp.matmul(K, sht.T, precision=PREC),
            mean + jnp.matmul(K, jnp.asarray(dz), precision=PREC))
