#!/usr/bin/env python
"""Kernel micro-benchmarks: the Pallas fused Kalman update vs the XLA
schedule at config-4 covariance sizes, plus the circle-moments kernel.
Prints one JSON line. Run ALONE (tunnel sessions serialize)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from shermbot_navigation_tpu.ops.pallas.cov_update import (
        fused_kalman_update, reference_kalman_update)
    from shermbot_navigation_tpu.ops.pallas.circle_moments import (
        circle_moments, reference_circle_moments)
    from shermbot_navigation_tpu.utils.tracing import time_fn

    D = int(os.environ.get("KERNEL_D", "4096"))
    rng = np.random.default_rng(0)
    cov = jnp.asarray(rng.normal(size=(D, D)).astype(np.float32))
    sht = jnp.asarray(rng.normal(size=(D, 2)).astype(np.float32))
    psi_inv = jnp.eye(2, dtype=jnp.float32)
    dz = jnp.ones(2, jnp.float32)
    mean = jnp.zeros(D, jnp.float32)

    g, gm = fused_kalman_update(cov, sht, psi_inv, dz, mean)
    w, wm = reference_kalman_update(cov, sht, psi_inv, dz, mean)
    err = float(jnp.abs(g - w).max())

    tp = time_fn(fused_kalman_update, cov, sht, psi_inv, dz, mean, iters=20)
    tx = time_fn(jax.jit(reference_kalman_update), cov, sht, psi_inv, dz,
                 mean, iters=20)
    bw = 2 * D * D * 4 / tp["best_s"] / 1e9

    C, P = 256, 64
    pts = jnp.asarray(rng.normal(size=(C, P, 2)).astype(np.float32))
    cnts = jnp.asarray(rng.integers(4, P, C))
    gm_, gc, gz = circle_moments(pts, cnts)
    wm_, wc, wz = reference_circle_moments(pts, cnts)
    merr = float(jnp.abs(gm_ - wm_).max())
    t1 = time_fn(circle_moments, pts, cnts, iters=20)
    t2 = time_fn(jax.jit(reference_circle_moments), pts, cnts, iters=20)

    print(json.dumps({
        "metric": "pallas_kernels",
        "cov_update_D": D,
        "cov_update_pallas_ms": round(tp["best_s"] * 1e3, 3),
        "cov_update_xla_ms": round(tx["best_s"] * 1e3, 3),
        "cov_update_speedup": round(tx["best_s"] / tp["best_s"], 2),
        "cov_update_hbm_GBps": round(bw, 1),
        "cov_update_max_err": err,
        "moments_pallas_ms": round(t1["best_s"] * 1e3, 3),
        "moments_xla_ms": round(t2["best_s"] * 1e3, 3),
        "moments_max_err": merr,
    }))


if __name__ == "__main__":
    main()
