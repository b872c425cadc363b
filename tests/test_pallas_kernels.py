"""Pallas kernels vs their XLA oracles (interpret mode on CPU; the compiled
TPU path is exercised by the benchmarks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shermbot_navigation_tpu.ops.pallas.cov_update import (
    fused_kalman_update, reference_kalman_update)
from shermbot_navigation_tpu.ops.pallas.circle_moments import (
    circle_moments, reference_circle_moments)


class TestFusedKalmanUpdate:
    @pytest.mark.parametrize("D,tile", [(256, 128), (512, 256)])
    def test_matches_reference(self, D, tile):
        rng = np.random.default_rng(0)
        A = rng.normal(size=(D, D)).astype(np.float32) * 0.1
        cov = jnp.asarray(A @ A.T + np.eye(D, dtype=np.float32))
        sht = jnp.asarray(rng.normal(size=(D, 2)).astype(np.float32))
        psi = jnp.asarray(
            (lambda m: m @ m.T + np.eye(2))(
                rng.normal(size=(2, 2))).astype(np.float32))
        psi_inv = jnp.linalg.inv(psi)
        dz = jnp.asarray(rng.normal(size=(2,)).astype(np.float32))
        mean = jnp.asarray(rng.normal(size=(D,)).astype(np.float32))

        got_cov, got_mean = fused_kalman_update(
            cov, sht, psi_inv, dz, mean, tile=tile, interpret=True)
        want_cov, want_mean = reference_kalman_update(
            cov, sht, psi_inv, dz, mean)
        np.testing.assert_allclose(got_cov, want_cov, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(got_mean, want_mean, rtol=1e-5, atol=1e-5)


class TestCircleMoments:
    def test_matches_reference(self):
        rng = np.random.default_rng(1)
        C, P = 16, 64
        pts = rng.normal(size=(C, P, 2)).astype(np.float32)
        counts = rng.integers(4, P, C)
        # zero the padded rows like the clustering stage does
        for c in range(C):
            pts[c, counts[c]:] = 0.0
        got_M, got_c, got_z = circle_moments(
            jnp.asarray(pts), jnp.asarray(counts), interpret=True)
        want_M, want_c, want_z = reference_circle_moments(
            jnp.asarray(pts), jnp.asarray(counts))
        np.testing.assert_allclose(got_M, want_M, rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(got_c, want_c, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got_z, want_z, rtol=1e-5, atol=1e-6)

    def test_feeds_fit(self):
        """Moments produced by the kernel reproduce the golden circle fit."""
        pts6 = np.zeros((8, 8, 2), np.float32)
        pts6[0, :6] = [[1, 7], [2, 6], [5, 8], [7, 7], [9, 5], [3, 7]]
        counts = np.array([6, 0, 0, 0, 0, 0, 0, 0])
        M, cent, zbar = circle_moments(
            jnp.asarray(pts6), jnp.asarray(counts), interpret=True)
        # run the eigen-chain from ops.circle_fit on the kernel's moments
        lam, V = jnp.linalg.eigh(M[0])
        s = jnp.sqrt(jnp.maximum(lam, 0.0))
        Y = (V * s[None, :]) @ V.T
        Hinv = jnp.array([[0.0, 0.0, 0.0, 0.5],
                          [0.0, 1.0, 0.0, 0.0],
                          [0.0, 0.0, 1.0, 0.0],
                          [0.5, 0.0, 0.0, -2.0 * float(zbar[0])]],
                         jnp.float32)
        Q = Y @ Hinv @ Y
        eq, EV = jnp.linalg.eigh(Q)
        k = jnp.argmin(jnp.where(eq > 0, eq, jnp.inf))
        A = jnp.linalg.solve(Y, EV[:, k])
        a = -A[1] / (2 * A[0]) + cent[0, 0]
        b = -A[2] / (2 * A[0]) + cent[0, 1]
        np.testing.assert_allclose([float(a), float(b)],
                                   [4.615482, 2.807354], atol=1e-3)
