#!/usr/bin/env python
"""Grid-kernel tile-size sweep (r05): does a bigger row tile beat the
(256, 2048) default?

At N=2048 the grid fits VMEM and the kernel measured ~1.0 TB/s vs the
2.7 TB/s VMEM stream rate — hypothesis: the 32-program launch + per-tile
DMA overhead is the residual, so fewer/larger tiles should close some of
it. At N=8192 (HBM regime, kernel AT the stream ceiling) larger tiles
must at least not regress. Timing: chained carried grid inside one
lax.scan (every dispatch a unique input — trap 14b), sync on a scalar
depending on the grid (trap 14a), two scan depths.

Run ALONE: python benchmarks/bench_grid_tiles.py
Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


M = 8


def measure(N, tr_cap, tc_cap, L1=20, L2=60):
    from shermbot_navigation_tpu.ops.pallas.grid_update import \
        fused_grid_update

    cov = jnp.ones((2, 2, N, N), jnp.float32) * 0.01
    # tiny nonzero updates so the carried grid is unique every iteration
    a = jnp.full((2, N, 2 * M), 1e-6, jnp.float32)
    b = jnp.full((2, 2 * M, N), 1e-6, jnp.float32)
    crow = jnp.zeros((2, 2, M, N), jnp.float32)
    ccol = jnp.zeros((2, 2, N, M), jnp.float32)
    rowt = jnp.full((N,), -1, jnp.int32)
    colt = jnp.full((N,), -1, jnp.int32)

    def mk(L):
        @jax.jit
        def loop(c):
            def body(c, _):
                return fused_grid_update(c, a, b, crow, ccol, rowt, colt,
                                         tr_cap=tr_cap, tc_cap=tc_cap), None
            c, _ = jax.lax.scan(body, c, None, length=L)
            return c
        return loop

    @jax.jit
    def sync(c):
        return jnp.sum(c)

    loopA, loopB = mk(L1), mk(L2)
    cov = loopA(cov)
    float(sync(cov))
    cov = loopB(cov)
    float(sync(cov))

    def timed(loop, c):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            c = loop(c)
            float(sync(c))
            best = min(best, time.perf_counter() - t0)
        return best, c

    tA, cov = timed(loopA, cov)
    tB, cov = timed(loopB, cov)
    t = (tB - tA) / (L2 - L1)
    gbps = 2 * 16 * N * N / t / 1e9
    return {"N": N, "tr_cap": tr_cap, "tc_cap": tc_cap,
            "ms_per_pass": round(t * 1e3, 3),
            "GBps_2pass": round(gbps, 1)}


def main():
    rows = []
    for N in (2048, 8192):
        for tr in (256, 512, 1024, 2048):
            if tr > N:
                continue
            r = measure(N, tr, 2048)
            log(str(r))
            rows.append(r)
    best2048 = max((r for r in rows if r["N"] == 2048),
                   key=lambda r: r["GBps_2pass"])
    print(json.dumps({
        "metric": "grid_kernel_tile_sweep",
        "value": best2048["GBps_2pass"],
        "unit": f"GB/s at N=2048 (best: tr_cap={best2048['tr_cap']})",
        "rows": rows}))


if __name__ == "__main__":
    main()
