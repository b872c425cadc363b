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

    print("compiling single pallas call...", file=sys.stderr, flush=True)
    g, gm = fused_kalman_update(cov, sht, psi_inv, dz, mean)
    w, wm = reference_kalman_update(cov, sht, psi_inv, dz, mean)
    err = float(jnp.abs(g - w).max())

    # Amortize the host->TPU dispatch RTT (~27 ms through the tunnel) by
    # chaining ITERS kernel applications inside ONE jitted scan.
    ITERS = int(os.environ.get('KERNEL_ITERS', '10'))

    @jax.jit
    def loop_pallas(cov, mean):
        def body(c, _):
            cv, mn = fused_kalman_update(c[0], sht, psi_inv, dz, c[1])
            return (cv, mn), None
        (cv, mn), _ = jax.lax.scan(body, (cov, mean), None, length=ITERS)
        return cv, mn

    @jax.jit
    def loop_xla(cov, mean):
        def body(c, _):
            cv, mn = reference_kalman_update(c[0], sht, psi_inv, dz, c[1])
            return (cv, mn), None
        (cv, mn), _ = jax.lax.scan(body, (cov, mean), None, length=ITERS)
        return cv, mn

    print("compiling pallas loop...", file=sys.stderr, flush=True)
    tp = time_fn(loop_pallas, cov, mean, iters=5)
    print("compiling xla loop...", file=sys.stderr, flush=True)
    tx = time_fn(loop_xla, cov, mean, iters=5)
    tp = {"best_s": tp["best_s"] / ITERS}
    tx = {"best_s": tx["best_s"] / ITERS}
    bw = 2 * D * D * 4 / tp["best_s"] / 1e9

    C, P = 256, 64
    pts = jnp.asarray(rng.normal(size=(C, P, 2)).astype(np.float32))
    cnts = jnp.asarray(rng.integers(4, P, C))
    gm_, gc, gz = circle_moments(pts, cnts)
    wm_, wc, wz = reference_circle_moments(pts, cnts)
    merr = float(jnp.abs(gm_ - wm_).max())
    ITERS2 = int(os.environ.get('KERNEL_ITERS', '10'))

    @jax.jit
    def loop_m(pts):
        def body(c, _):
            M, cent, zb = circle_moments(c, cnts)
            return c + 1e-12 * zb[0], M
        c, Ms = jax.lax.scan(body, pts, None, length=ITERS2)
        return Ms[-1]

    @jax.jit
    def loop_mx(pts):
        def body(c, _):
            M, cent, zb = reference_circle_moments(c, cnts)
            return c + 1e-12 * zb[0], M
        c, Ms = jax.lax.scan(body, pts, None, length=ITERS2)
        return Ms[-1]

    print("compiling moments loops...", file=sys.stderr, flush=True)
    t1 = time_fn(loop_m, pts, iters=5)
    t2 = time_fn(loop_mx, pts, iters=5)
    t1 = {"best_s": t1["best_s"] / ITERS2}
    t2 = {"best_s": t2["best_s"] / ITERS2}

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
