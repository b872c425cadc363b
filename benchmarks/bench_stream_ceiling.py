#!/usr/bin/env python
"""The session's TRUE HBM stream ceiling, measured with a body XLA cannot
collapse.

Pathology (r03): a scan whose body is affine with constant coefficients
(``c = c*k + b`` — what the r02-written benches used as the "stream
ceiling") composes across iterations into a single elementwise op, so the
measured time is depth-INDEPENDENT (two-depth probe: iter_ms ~ 0) and the
"ceiling" it reports is really the dispatch floor + ONE pass. Every
pct-of-ceiling claim needs a non-foldable body: ``c = |c|*k + b`` breaks
the affine composition at zero cost (1 extra VPU op per element).

Measures one-read-one-write GB/s at two shapes (config-4 grid sizes),
two depths each, with the dispatch floor solved out.

Run ALONE: python benchmarks/bench_stream_ceiling.py
Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


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


def probe(D, body_kind, L1=20, L2=200):
    x = jnp.ones((D, D), jnp.float32)

    def mk(L):
        @jax.jit
        def loop(c):
            def body(c, _):
                if body_kind == "affine":      # collapsible — the control
                    return c * 1.0000001 + 1e-9, None
                return jnp.abs(c) * 1.0000001 + 1e-9, None  # non-foldable
            c, _ = jax.lax.scan(body, c, None, length=L)
            return c
        return loop

    tA = best_time(mk(L1), x)
    tB = best_time(mk(L2), x)
    t_iter = (tB - tA) / (L2 - L1)
    floor = max(tA - L1 * t_iter, 0.0)
    bw = 2 * 4 * D * D / t_iter / 1e9 if t_iter > 0 else float("inf")
    return {"D": D, "body": body_kind,
            "iter_ms": round(t_iter * 1e3, 3),
            "floor_ms": round(floor * 1e3, 2),
            "GBps": round(bw, 1) if np.isfinite(bw) else None}


def main():
    rows = []
    for D in (4096, 16384):
        for kind in ("affine", "abs"):
            log(f"D={D} body={kind} ...")
            row = probe(D, kind)
            log(str(row))
            rows.append(row)
    true_ceiling = max(r["GBps"] for r in rows
                       if r["body"] == "abs" and r["GBps"])
    print(json.dumps({
        "metric": "hbm_stream_ceiling",
        "value": true_ceiling,
        "unit": "GB/s (one-read-one-write, non-foldable body, floor removed)",
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
