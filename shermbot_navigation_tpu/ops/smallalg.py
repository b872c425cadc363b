"""Closed-form small-matrix algebra for TPU hot loops.

``jnp.linalg.solve``/``eigh`` on tiny systems lower to LAPACK-style loops
that are catastrophically slow inside ``lax.scan`` on TPU (measured: a 3x3
solve per scan iteration costs ~2600x more than the closed form). Every
small dense solve in a hot path must use these instead; ``jnp.linalg`` is
reserved for host-side / one-shot code.

All functions broadcast over leading batch dims and are branchless.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# TPU MXU demotes f32 matmuls/einsums to bf16 by default; the Jacobi
# rotation chain loses orthogonality at 8 mantissa bits. Pin full f32.
PRECISION = jax.lax.Precision.HIGHEST


def inv2(M, eps: float = 1e-30):
    """Closed-form 2x2 inverse (batched)."""
    a, b = M[..., 0, 0], M[..., 0, 1]
    c, d = M[..., 1, 0], M[..., 1, 1]
    det = a * d - b * c
    det = jnp.where(jnp.abs(det) < eps, jnp.full_like(det, eps), det)
    out = jnp.stack([
        jnp.stack([d, -b], axis=-1),
        jnp.stack([-c, a], axis=-1)], axis=-2)
    return out / det[..., None, None]


def solve3(M, v, eps: float = 1e-30):
    """Closed-form 3x3 solve via the adjugate (batched): ``M x = v``."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    det = jnp.where(jnp.abs(det) < eps, jnp.full_like(det, eps), det)
    x0 = A * v[..., 0] + B * v[..., 1] + C * v[..., 2]
    x1 = D * v[..., 0] + E * v[..., 1] + F * v[..., 2]
    x2 = G * v[..., 0] + H * v[..., 1] + I * v[..., 2]
    return jnp.stack([x0, x1, x2], axis=-1) / det[..., None]


def solve4(M, v, eps: float = 1e-30):
    """4x4 solve by cofactor expansion of the inverse (batched).

    Direct adjugate of a 4x4: 16 cofactors, each a 3x3 determinant built
    from the 18 distinct 2x2 minors — ~100 fused multiply-adds, entirely
    VPU-friendly.
    """
    m = M
    # 2x2 minors of rows (2,3)
    s0 = m[..., 2, 0] * m[..., 3, 1] - m[..., 2, 1] * m[..., 3, 0]
    s1 = m[..., 2, 0] * m[..., 3, 2] - m[..., 2, 2] * m[..., 3, 0]
    s2 = m[..., 2, 0] * m[..., 3, 3] - m[..., 2, 3] * m[..., 3, 0]
    s3 = m[..., 2, 1] * m[..., 3, 2] - m[..., 2, 2] * m[..., 3, 1]
    s4 = m[..., 2, 1] * m[..., 3, 3] - m[..., 2, 3] * m[..., 3, 1]
    s5 = m[..., 2, 2] * m[..., 3, 3] - m[..., 2, 3] * m[..., 3, 2]
    # 2x2 minors of rows (0,1)
    c0 = m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]
    c1 = m[..., 0, 0] * m[..., 1, 2] - m[..., 0, 2] * m[..., 1, 0]
    c2 = m[..., 0, 0] * m[..., 1, 3] - m[..., 0, 3] * m[..., 1, 0]
    c3 = m[..., 0, 1] * m[..., 1, 2] - m[..., 0, 2] * m[..., 1, 1]
    c4 = m[..., 0, 1] * m[..., 1, 3] - m[..., 0, 3] * m[..., 1, 1]
    c5 = m[..., 0, 2] * m[..., 1, 3] - m[..., 0, 3] * m[..., 1, 2]

    det = c0 * s5 - c1 * s4 + c2 * s3 + c3 * s2 - c4 * s1 + c5 * s0
    det = jnp.where(jnp.abs(det) < eps, jnp.full_like(det, eps), det)

    inv = jnp.stack([
        jnp.stack([
            m[..., 1, 1] * s5 - m[..., 1, 2] * s4 + m[..., 1, 3] * s3,
            -m[..., 0, 1] * s5 + m[..., 0, 2] * s4 - m[..., 0, 3] * s3,
            m[..., 3, 1] * c5 - m[..., 3, 2] * c4 + m[..., 3, 3] * c3,
            -m[..., 2, 1] * c5 + m[..., 2, 2] * c4 - m[..., 2, 3] * c3,
        ], axis=-1),
        jnp.stack([
            -m[..., 1, 0] * s5 + m[..., 1, 2] * s2 - m[..., 1, 3] * s1,
            m[..., 0, 0] * s5 - m[..., 0, 2] * s2 + m[..., 0, 3] * s1,
            -m[..., 3, 0] * c5 + m[..., 3, 2] * c2 - m[..., 3, 3] * c1,
            m[..., 2, 0] * c5 - m[..., 2, 2] * c2 + m[..., 2, 3] * c1,
        ], axis=-1),
        jnp.stack([
            m[..., 1, 0] * s4 - m[..., 1, 1] * s2 + m[..., 1, 3] * s0,
            -m[..., 0, 0] * s4 + m[..., 0, 1] * s2 - m[..., 0, 3] * s0,
            m[..., 3, 0] * c4 - m[..., 3, 1] * c2 + m[..., 3, 3] * c0,
            -m[..., 2, 0] * c4 + m[..., 2, 1] * c2 - m[..., 2, 3] * c0,
        ], axis=-1),
        jnp.stack([
            -m[..., 1, 0] * s3 + m[..., 1, 1] * s1 - m[..., 1, 2] * s0,
            m[..., 0, 0] * s3 - m[..., 0, 1] * s1 + m[..., 0, 2] * s0,
            -m[..., 3, 0] * c3 + m[..., 3, 1] * c1 - m[..., 3, 2] * c0,
            m[..., 2, 0] * c3 - m[..., 2, 1] * c1 + m[..., 2, 2] * c0,
        ], axis=-1),
    ], axis=-2) / det[..., None, None]
    return jnp.einsum("...ij,...j->...i", inv, v, precision=PRECISION)


def eigh4_jacobi(M, sweeps: int = 8):
    """Symmetric 4x4 eigendecomposition via cyclic Jacobi rotations,
    batched and branchless (fixed sweep count; ~machine precision for
    well-scaled inputs after 6-8 sweeps).

    Returns (eigenvalues ascending, eigenvectors as columns) matching
    ``jnp.linalg.eigh``'s convention.

    COMPONENT rotation body: closed-form Givens row/col updates on 16+16
    flat (...,)-shaped arrays, not (..., 4, 4) einsums — a batched 4x4
    einsum lowers to a TPU convolution whose trailing dims pad onto
    (8, 128) tiles (~64x HBM inflation, pathology 9; the lidar tick
    carried 144 of them). The sweep loop is a lax.scan with the body
    compiled ONCE: fully unrolling the rotation chain hits an XLA:CPU
    compile cliff (1/2/3 sweeps compile in 0.3/1/2 s; 4+ hang > 9 min,
    optimization barriers do not help — recorded negative, r04).
    """
    dt = M.dtype
    Ms = 0.5 * (M + jnp.swapaxes(M, -1, -2))
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    A0 = [Ms[..., i, j] for i in range(4) for j in range(4)]
    eye = [jnp.full_like(Ms[..., 0, 0], 1.0 if i == j else 0.0)
           for i in range(4) for j in range(4)]

    def sweep(carry, _):
        flat = list(carry)
        A = [[flat[i * 4 + j] for j in range(4)] for i in range(4)]
        V = [[flat[16 + i * 4 + j] for j in range(4)] for i in range(4)]
        for (p, q) in pairs:
            theta = 0.5 * jnp.arctan2(2.0 * A[p][q], A[q][q] - A[p][p])
            c = jnp.cos(theta)
            s = jnp.sin(theta)
            # B = G^T A (rows p, q), then A' = B G (cols p, q); V' = V G.
            # G = I except G[pp]=G[qq]=c, G[pq]=s, G[qp]=-s.
            Bp = [c * A[p][k] - s * A[q][k] for k in range(4)]
            Bq = [s * A[p][k] + c * A[q][k] for k in range(4)]
            B = [Bp if i == p else Bq if i == q else A[i]
                 for i in range(4)]
            A = [[(c * B[i][p] - s * B[i][q]) if j == p
                  else (s * B[i][p] + c * B[i][q]) if j == q
                  else B[i][j]
                  for j in range(4)] for i in range(4)]
            V = [[(c * V[i][p] - s * V[i][q]) if j == p
                  else (s * V[i][p] + c * V[i][q]) if j == q
                  else V[i][j]
                  for j in range(4)] for i in range(4)]
        return tuple(x for row in A for x in row) + tuple(
            x for row in V for x in row), None

    flat, _ = jax.lax.scan(sweep, tuple(A0) + tuple(eye), None,
                           length=sweeps)
    lam = jnp.stack([flat[i * 4 + i] for i in range(4)], axis=-1)
    V = jnp.stack(
        [jnp.stack([flat[16 + i * 4 + j] for j in range(4)], axis=-1)
         for i in range(4)], axis=-2)
    order = jnp.argsort(lam, axis=-1)
    # apply the sort permutation with one-hot einsums, not
    # take_along_axis — a vmapped data-dependent gather is slow on TPU
    # (BENCH_NOTES pathology 15 family); the 4x4 one-hot contraction is
    # a fused VPU op
    onehot = (order[..., :, None]
              == jnp.arange(4)[None, :]).astype(lam.dtype)       # (...,k,j)
    lam_sorted = jnp.einsum("...kj,...j->...k", onehot, lam,
                            precision=PRECISION)
    V_sorted = jnp.einsum("...ij,...kj->...ik", V, onehot,
                          precision=PRECISION)
    return lam_sorted, V_sorted
