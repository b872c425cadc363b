"""Fused EKF Kalman-update kernel: gain, mean shift, rank-2 covariance
downdate in one pass over HBM.

The update (ref ``update``, slam_library.cpp:263-282; sparse form in
``models.ekf_slam.update``) reduces to::

    K    = SHt @ psi_inv                  (D, 2)
    mean'= mean + K @ dz                  (D,)
    cov' = cov - K @ SHt^T                (D, D)   <- the HBM-bound part

``cov`` is touched exactly once (read + write); everything else lives in
VMEM. The kernel tiles cov rows, keeps the full ``SHt`` (D, 2) resident,
computes the row-tile's gain on the fly and applies the outer product —
one fused pass at HBM speed-of-light (2 x 4 x D^2 bytes moved, zero
intermediate materialization). XLA's default schedule materializes K and
the (D, D) outer product separately; at D = 4003 (config 4) that is 3
passes over 64 MB instead of 2.

Shapes must be lane-aligned: D padded to a multiple of 128 (the EKF state
is padded at allocation; see ``parallel``/config-4 wiring). The trailing-2
measurement dim rides along in the lane dimension of small operands.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(cov_ref, sht_full_ref, psi_inv_ref, dz_ref, mean_ref,
            sht_tile_ref, cov_out_ref, mean_out_ref):
    """One row-tile of the fused update.

    cov_ref:      (TILE, D)   current covariance row tile
    sht_full_ref: (D, 2)      full Sigma H^T (resident every program)
    psi_inv_ref:  (2, 2)
    dz_ref:       (1, 2)      innovation
    mean_ref:     (TILE, 1)   mean slice as a column
    sht_tile_ref: (TILE, 2)   this tile's rows of Sigma H^T
    """
    # NOTE: preferred_element_type only pins the ACCUMULATOR; the MXU still
    # multiplies f32 inputs in bf16 unless precision=HIGHEST. The rank-2
    # contraction is K=2 — scalar-ish work where full precision is free.
    prec = jax.lax.Precision.HIGHEST
    psi_inv = psi_inv_ref[:]                      # (2, 2)
    k_tile = jnp.dot(sht_tile_ref[:], psi_inv,
                     preferred_element_type=jnp.float32,
                     precision=prec)              # (TILE, 2)
    dz = dz_ref[0, :]                             # (2,)
    mean_out_ref[:] = mean_ref[:] + jnp.dot(
        k_tile, dz[:, None], preferred_element_type=jnp.float32,
        precision=prec).astype(mean_ref.dtype)
    # cov_tile - K_tile @ SHt_full^T: (TILE,2) @ (2,D)
    cov_out_ref[:] = cov_ref[:] - jax.lax.dot_general(
        k_tile, sht_full_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    ).astype(cov_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def fused_kalman_update(cov, sht, psi_inv, dz, mean, tile: int = 256,
                        interpret: bool = False):
    """Apply the fused update. ``cov`` (D, D) with D % 128 == 0 and
    D % tile == 0; ``sht`` (D, 2); ``psi_inv`` (2, 2); ``dz`` (2,);
    ``mean`` (D,). Returns (cov', mean')."""
    D = cov.shape[0]
    assert D % 128 == 0, f"D={D} must be lane-aligned (pad to 128)"
    assert D % tile == 0, f"D={D} not divisible by tile={tile}"
    grid = (D // tile,)

    cov_out, mean_out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),          # cov row tile
            pl.BlockSpec((D, 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # SHt full
            pl.BlockSpec((2, 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # psi_inv
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # dz
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),          # mean col tile
            pl.BlockSpec((tile, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),          # SHt row tile
        ],
        out_specs=[
            pl.BlockSpec((tile, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((D, D), cov.dtype),
            jax.ShapeDtypeStruct((D, 1), mean.dtype),
        ],
        input_output_aliases={0: 0},
        interpret=interpret,
    )(cov, sht, psi_inv, jnp.asarray(dz).reshape(1, 2),
      jnp.asarray(mean).reshape(D, 1), sht)
    return cov_out, mean_out[:, 0]


def reference_kalman_update(cov, sht, psi_inv, dz, mean):
    """XLA reference for the same math (test oracle / fallback)."""
    prec = jax.lax.Precision.HIGHEST
    K = jnp.matmul(sht, psi_inv, precision=prec)
    return (cov - jnp.matmul(K, sht.T, precision=prec),
            mean + jnp.matmul(K, jnp.asarray(dz), precision=prec))
