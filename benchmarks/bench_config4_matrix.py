#!/usr/bin/env python
"""Config-4 single-session A/B matrix on the real chip (VERDICT round 1
items 1d/9): sequential vs deferred vs kernelized-deferred, known and
unknown association, N=2048 and N=8192 — all measured inside ONE process /
ONE tunnel session so day-to-day tunnel variance (±20%, BENCH_NOTES) cannot
contaminate the comparison. Also probes the session's achievable HBM stream
ceiling and the fused grid kernel in isolation, so the roofline residual
can be attributed (chip/tunnel ceiling vs schedule overhead).

Physical-traffic models per tick (f32 grid = 16 N^2 bytes):
- sequential:          M grid read+write passes  -> 2*M*16*N^2 bytes
- deferred (XLA):      sub matmul materializes a grid-sized buffer then a
                       fused select-subtract pass -> ~4*16*N^2 bytes
- deferred (Pallas):   one fused read+write       -> 2*16*N^2 bytes (floor)

Run ALONE: python benchmarks/bench_config4_matrix.py
Prints one JSON line (a list of rows).
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


def run_variant(N, M, T, unknown, deferred, grid_kernel, seqk=False):
    from shermbot_navigation_tpu.models.ekf_slam import EKFConfig
    from shermbot_navigation_tpu.parallel import bigmap, blocked_ekf
    from shermbot_navigation_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(jax.devices()[:1], data=1)
    cfg = EKFConfig(num_landmarks=N)
    wl = bigmap.make_workload(N, T, M, jax.random.PRNGKey(0))
    maker = bigmap.make_unknown_runner if unknown else bigmap.make_runner
    runner = maker(cfg, mesh, 1, M, deferred=deferred,
                   grid_kernel=grid_kernel if deferred else None,
                   seq_kernel=seqk if deferred else None)
    state = blocked_ekf.init(cfg, 1)
    specs = blocked_ekf.state_sharding(mesh)
    state = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs)
    Q = jnp.diag(jnp.array([1e-4] * 3, jnp.float32))
    R = jnp.diag(jnp.array([1e-3] * 2, jnp.float32))

    out = runner(state, wl, Q, R, jnp.int32(0), T)      # compile + warmup
    float(out.mean_r[0, 0])
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        out = runner(out, wl, Q, R, jnp.int32(T), T)
        float(out.mean_r[0, 0])
        best = min(best, time.time() - t0)
    ticks = T / best
    grid_bytes = 16 * N * N
    # pass model: sequential touches the grid 2M times; deferred XLA =
    # sub-matmul + select pass + the mm0cT per-plane transpose (~6);
    # the seq-kernel path skips the transpose (~4); the Pallas grid pass
    # replaces sub+select with one read+write (2).
    if not deferred:
        passes = 2 * M
    else:
        passes = (2 if grid_kernel else 4) + (0 if seqk else 2)
    phys = ticks * passes * grid_bytes
    step = "deferred" if deferred else "sequential"
    if deferred and seqk:
        step += "+seqk"
    if deferred and grid_kernel:
        step += "+gridk"
    return {
        "N": N, "assoc": "unknown" if unknown else "known",
        "step": step,
        "ticks_per_s": round(ticks, 2),
        "updates_per_s": round(ticks * M, 1),
        "grid_passes_model": passes,
        "physical_GBps": round(phys / 1e9, 1),
        "pct_of_hbm_spec": round(100 * phys / 1e9 / 819.0, 1),
    }


def stream_ceiling(D=4096, iters=20):
    """The session's achievable one-read-one-write stream bandwidth via a
    trivial XLA elementwise pass over a (D, D) f32 buffer."""
    from shermbot_navigation_tpu.utils.tracing import time_fn
    x = jnp.ones((D, D), jnp.float32)

    @jax.jit
    def loop(x):
        def body(c, _):
            return c * 1.0000001 + 1e-9, None
        c, _ = jax.lax.scan(body, x, None, length=iters)
        return c

    t = time_fn(loop, x, iters=5)["best_s"] / iters
    return 2 * 4 * D * D / t / 1e9


def grid_kernel_micro(N=2048, M=8, iters=10):
    """The fused grid kernel in isolation at config-4 shapes."""
    from shermbot_navigation_tpu.ops.pallas.grid_update import (
        fused_grid_update)
    from shermbot_navigation_tpu.utils.tracing import time_fn
    rng = np.random.default_rng(0)
    M2 = 2 * M
    cov = jnp.asarray(rng.normal(size=(2, 2, N, N)).astype(np.float32))
    a = jnp.asarray(rng.normal(size=(2, N, M2)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(2, M2, N)).astype(np.float32))
    crow = jnp.asarray(rng.normal(size=(2, 2, M, N)).astype(np.float32))
    ccol = jnp.asarray(rng.normal(size=(2, 2, N, M)).astype(np.float32))
    rowt = jnp.full((N,), -1, jnp.int32).at[:8].set(0)
    colt = jnp.full((N,), -1, jnp.int32).at[:8].set(0)

    @jax.jit
    def loop(cov):
        def body(c, _):
            return fused_grid_update(c, a, b, crow, ccol, rowt, colt), None
        c, _ = jax.lax.scan(body, cov, None, length=iters)
        return c

    t = time_fn(loop, cov, iters=5)["best_s"] / iters
    return {"grid_kernel_ms": round(t * 1e3, 3),
            "grid_kernel_GBps": round(2 * 4 * 4 * N * N / t / 1e9, 1)}


def main():
    rows = []
    log("stream ceiling...")
    ceiling = stream_ceiling()
    log(f"stream ceiling: {ceiling:.0f} GB/s")
    log("grid kernel micro...")
    micro = grid_kernel_micro()
    log(str(micro))

    # (N, unknown, deferred, grid_kernel, seq_kernel). Grid-kernel rows at
    # N=8192 are possible again with the comp-plane grid state (the old
    # flat-operand relayout copy OOM'd at 64 GiB; planes have no relayout).
    matrix = [
        (2048, False, True, False, True), (2048, False, True, True, True),
        (2048, False, True, False, False), (2048, False, True, True, False),
        (2048, False, False, False, False),
        (2048, True, True, False, True), (2048, True, True, False, False),
        (2048, True, False, False, False),
        (8192, False, True, False, True), (8192, False, True, True, True),
        (8192, False, True, False, False),
        (8192, False, False, False, False),
        (8192, True, True, False, True),
    ]
    for N, unknown, deferred, gk, seqk in matrix:
        T = 100 if (N == 2048 and seqk) else 50 if N == 2048 else 20
        log(f"running N={N} unknown={unknown} deferred={deferred} "
            f"gk={gk} seqk={seqk}")
        row = run_variant(N, 8, T, unknown, deferred, gk, seqk)
        log(str(row))
        rows.append(row)

    best2048 = max(r["ticks_per_s"] for r in rows
                   if r["N"] == 2048 and r["assoc"] == "known")
    print(json.dumps({
        "metric": "config4_matrix_single_session",
        "value": best2048,
        "unit": "ticks/s (best known-assoc N=2048)",
        "stream_ceiling_GBps": round(ceiling, 1),
        **micro,
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
