"""Circle-fit front end as one Pallas pass: masked centroid + 4x4 moment
matrix per cluster.

The batched Hyperaccurate fit (ops/circle_fit.py; ref
circle_fit_library.cpp:15-67) spends its data-touching phase on per-cluster
reductions: centroid, centered coordinates, ``z = x^2 + y^2``, ``z_bar`` and
``M = Z^T Z`` with ``Z = [z, x, y, 1]``. This kernel fuses all of it into a
single read of the (C, P, 2) point buffer — one program per cluster tile,
everything in VMEM, outputs ``M`` (C, 4, 4), centroids (C, 2) and ``z_bar``
(C,). The tiny 4x4 eigen-chain stays in XLA (not data-bound).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, y_ref, count_ref, m_ref, cent_ref, zbar_ref):
    """One tile of clusters.

    x_ref, y_ref: (TC, P) point coordinates (zero-padded rows ignored by mask)
    count_ref:    (TC, 1) valid point counts
    m_ref:        (TC, 16) moment matrices, row-major 4x4
    cent_ref:     (TC, 2)
    zbar_ref:     (TC, 1)
    """
    x = x_ref[:]
    y = y_ref[:]
    P = x.shape[1]
    count = count_ref[:]                                 # (TC, 1)
    pos = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    w = (pos < count).astype(x.dtype)                    # (TC, P)
    n = jnp.maximum(count.astype(x.dtype), 1.0)          # (TC, 1)

    xw = x * w
    yw = y * w
    cx = jnp.sum(xw, axis=1, keepdims=True) / n          # (TC, 1)
    cy = jnp.sum(yw, axis=1, keepdims=True) / n
    xc = (x - cx) * w
    yc = (y - cy) * w
    z = xc * xc + yc * yc

    def s(a):
        return jnp.sum(a, axis=1)                        # (TC,)

    szz = s(z * z)
    szx = s(z * xc)
    szy = s(z * yc)
    sz = s(z)
    sxx = s(xc * xc)
    sxy = s(xc * yc)
    sx = s(xc)
    syy = s(yc * yc)
    sy = s(yc)
    sn = s(w)

    # M = Z^T Z, Z rows [z, x, y, 1] (masked rows are all-zero)
    m_ref[:] = jnp.stack(
        [szz, szx, szy, sz,
         szx, sxx, sxy, sx,
         szy, sxy, syy, sy,
         sz, sx, sy, sn], axis=1)
    cent_ref[:] = jnp.concatenate([cx, cy], axis=1)
    zbar_ref[:] = jnp.sum(z, axis=1, keepdims=True) / n


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def circle_moments_raw(points, counts, tile: int = 8,
                       interpret: bool = False):
    """points (C, P, 2), counts (C,) -> (M16 (C, 16) row-major flat,
    centroid (C, 2), z_bar (C,)). C must be divisible by ``tile``.

    The flat (C, 16) form is what the componentized fit tail consumes
    (ops/circle_fit._fit_tail_c) — reshaping to (C, 4, 4) creates a
    tensor whose trailing dims pad onto (8, 128) TPU tiles and whose
    per-entry slices each re-read the padded buffer (pathology 9)."""
    C, P, _ = points.shape
    assert C % tile == 0, f"C={C} not divisible by tile={tile}"
    x = points[..., 0]
    y = points[..., 1]
    cnt = jnp.asarray(counts, jnp.int32).reshape(C, 1)
    grid = (C // tile,)

    m, cent, zbar = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, P), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, P), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, 16), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, 16), points.dtype),
            jax.ShapeDtypeStruct((C, 2), points.dtype),
            jax.ShapeDtypeStruct((C, 1), points.dtype),
        ],
        interpret=interpret,
    )(x, y, cnt)
    return m, cent, zbar[:, 0]


def circle_moments(points, counts, tile: int = 8, interpret: bool = False):
    """Tensor-output wrapper: (M (C, 4, 4), centroid (C, 2), z_bar (C,))."""
    m, cent, zbar = circle_moments_raw(points, counts, tile=tile,
                                       interpret=interpret)
    return m.reshape(points.shape[0], 4, 4), cent, zbar


def reference_circle_moments(points, counts):
    """XLA oracle computing the same quantities (mirrors ops/circle_fit)."""
    C, P, _ = points.shape
    dt = points.dtype
    mask = jnp.arange(P)[None, :] < jnp.asarray(counts)[:, None]
    w = mask.astype(dt)
    n = jnp.maximum(jnp.asarray(counts, dt), 1.0)[:, None]
    cx = jnp.sum(points[..., 0] * w, axis=1, keepdims=True) / n
    cy = jnp.sum(points[..., 1] * w, axis=1, keepdims=True) / n
    x = (points[..., 0] - cx) * w
    y = (points[..., 1] - cy) * w
    z = x * x + y * y
    Z = jnp.stack([z, x, y, w], axis=-1)
    M = jnp.einsum("cpi,cpj->cij", Z, Z,
                   precision=jax.lax.Precision.HIGHEST)
    zbar = jnp.sum(z, axis=1) / n[:, 0]
    return M, jnp.concatenate([cx, cy], axis=1), zbar
