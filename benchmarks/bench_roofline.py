#!/usr/bin/env python
"""Roofline accounting for the config-4 grid pass (BASELINE target 4 /
VERDICT round-1 item 1d): where do the bytes/second go, measured in ONE
session with the dispatch floor explicitly separated.

Method: every quantity is measured at TWO amortization depths (scan length
L1 inside one program vs L2), so the per-program tunnel dispatch floor and
the true on-chip per-iteration time can be solved from

    t_call(L) = floor + L * t_iter.

Rows:
- stream ceiling: one-read-one-write XLA elementwise pass over a grid-
  sized f32 buffer — the session's achievable HBM stream bound for this
  shape (the spec sheet says 819 GB/s; tile padding, fusion limits and the
  chip's effective stream efficiency all land here);
- fused grid kernel (ops/pallas/grid_update) at config-4 shapes;
- XLA deferred grid pass (reference_grid_update) at the same shapes;
- the full deferred tick (predict + 8 strip updates + grid pass) known
  association, as ticks/s at two rollout lengths.

Run ALONE. Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def best_time(fn, *args, reps=4):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def two_depth(make_loop, L1, L2, *args):
    """Solve (floor, t_iter) from calls at two scan lengths."""
    tA = best_time(make_loop(L1), *args)
    tB = best_time(make_loop(L2), *args)
    t_iter = (tB - tA) / (L2 - L1)
    floor = max(tA - L1 * t_iter, 0.0)
    return floor, t_iter


def main():
    from shermbot_navigation_tpu.ops.pallas.grid_update import (
        fused_grid_update, reference_grid_update)

    N = int(os.environ.get("ROOFLINE_N", "2048"))
    M = 8
    R2 = C2 = 2 * N
    M2 = 2 * M
    GRID = 4 * R2 * C2                       # bytes of the f32 grid
    rng = np.random.default_rng(0)
    cov = jnp.asarray(rng.normal(size=(R2, C2)).astype(np.float32))
    a = jnp.asarray(rng.normal(size=(R2, M2)).astype(np.float32) * 1e-3)
    b = jnp.asarray(rng.normal(size=(M2, C2)).astype(np.float32) * 1e-3)
    crow = jnp.asarray(rng.normal(size=(M2, C2)).astype(np.float32))
    ccol = jnp.asarray(rng.normal(size=(R2, M2)).astype(np.float32))
    rowt = jnp.full((R2,), -1, jnp.int32).at[:16].set(0)
    colt = jnp.full((C2,), -1, jnp.int32).at[:16].set(0)

    # --- stream ceiling ---
    def mk_stream(L):
        @jax.jit
        def loop(x):
            def body(c, _):
                return c * 1.0000001 + 1e-9, None
            c, _ = jax.lax.scan(body, x, None, length=L)
            return c
        return loop

    log("stream ceiling (two depths)...")
    fl, ti = two_depth(mk_stream, 20, 200, cov)
    stream = {"floor_ms": round(fl * 1e3, 2), "iter_ms": round(ti * 1e3, 3),
              "GBps": round(2 * GRID / ti / 1e9, 1)}
    log(f"stream: {stream}")

    # --- fused grid kernel ---
    def mk_kernel(L):
        @jax.jit
        def loop(c0):
            def body(c, _):
                return fused_grid_update(c, a, b, crow, ccol, rowt, colt), None
            c, _ = jax.lax.scan(body, c0, None, length=L)
            return c
        return loop

    log("grid kernel (two depths)...")
    fl, ti = two_depth(mk_kernel, 10, 100, cov)
    kern = {"floor_ms": round(fl * 1e3, 2), "iter_ms": round(ti * 1e3, 3),
            "GBps": round(2 * GRID / ti / 1e9, 1)}
    log(f"kernel: {kern}")

    # --- XLA deferred grid pass ---
    def mk_xla(L):
        @jax.jit
        def loop(c0):
            def body(c, _):
                return reference_grid_update(c, a, b, crow, ccol,
                                             rowt, colt), None
            c, _ = jax.lax.scan(body, c0, None, length=L)
            return c
        return loop

    log("xla grid pass (two depths)...")
    fl, ti = two_depth(mk_xla, 10, 100, cov)
    xla = {"floor_ms": round(fl * 1e3, 2), "iter_ms": round(ti * 1e3, 3),
           "GBps_at_2pass_model": round(2 * GRID / ti / 1e9, 1)}
    log(f"xla: {xla}")

    # --- full deferred tick, two rollout depths ---
    from shermbot_navigation_tpu.models.ekf_slam import EKFConfig
    from shermbot_navigation_tpu.parallel import bigmap, blocked_ekf
    from shermbot_navigation_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(jax.devices()[:1], data=1)
    cfg = EKFConfig(num_landmarks=N)
    wl = bigmap.make_workload(N, 512, M, jax.random.PRNGKey(0))
    Q = jnp.diag(jnp.array([1e-4] * 3, jnp.float32))
    R = jnp.diag(jnp.array([1e-3] * 2, jnp.float32))
    specs = blocked_ekf.state_sharding(mesh)

    ticks = {}
    for gk in (True, False):
        runner = bigmap.make_runner(cfg, mesh, 1, M, deferred=True,
                                    grid_kernel=gk)
        st = blocked_ekf.init(cfg, 1)
        st = jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), st, specs)
        log(f"deferred tick gk={gk} (two depths)...")
        st = runner(st, wl, Q, R, jnp.int32(0), 50)   # compile+warm both T
        st = runner(st, wl, Q, R, jnp.int32(0), 250)
        float(st.mean_r[0, 0])
        tA = best_time(lambda s: runner(s, wl, Q, R, jnp.int32(0), 50), st)
        tB = best_time(lambda s: runner(s, wl, Q, R, jnp.int32(0), 250), st)
        t_tick = (tB - tA) / 200
        floor = max(tA - 50 * t_tick, 0.0)
        key = "kernel" if gk else "xla"
        ticks[key] = {"floor_ms": round(floor * 1e3, 2),
                      "tick_ms": round(t_tick * 1e3, 3),
                      "ticks_per_s": round(1.0 / t_tick, 1)}
        log(f"tick[{key}]: {ticks[key]}")

    print(json.dumps({
        "metric": "config4_grid_roofline",
        "value": kern["GBps"],
        "unit": "GB/s (fused grid kernel, dispatch-floor removed)",
        "N": N, "grid_MB": round(GRID / 1e6, 1),
        "hbm_spec_GBps": 819.0,
        "stream_ceiling": stream,
        "grid_kernel": kern,
        "xla_grid_pass": xla,
        "deferred_tick": ticks,
    }))


if __name__ == "__main__":
    main()
