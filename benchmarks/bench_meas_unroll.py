#!/usr/bin/env python
"""A/B: unrolling the M=8 per-measurement scan inside the deferred tick
(blocked_ekf meas_unroll). BENCH_NOTES pathology 3 showed nested scans
inside the outer tick scan cost ~6x in the dense pipeline; at N=2048 the
deferred tick spends ~5.7 of 8.3 ms OUTSIDE the grid pass, so the
small-strip measurement loop is the suspect. Unrolling is bitwise-
semantics-preserving (verified on CPU, known+unknown).

Run ALONE: python benchmarks/bench_meas_unroll.py
Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def run_variant(N, M, T, unknown, unroll):
    from shermbot_navigation_tpu.models.ekf_slam import EKFConfig
    from shermbot_navigation_tpu.parallel import bigmap, blocked_ekf
    from shermbot_navigation_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(jax.devices()[:1], data=1)
    cfg = EKFConfig(num_landmarks=N)
    wl = bigmap.make_workload(N, T, M, jax.random.PRNGKey(0))
    maker = bigmap.make_unknown_runner if unknown else bigmap.make_runner
    runner = maker(cfg, mesh, 1, M, deferred=True, grid_kernel=False,
                   meas_unroll=unroll)
    state = blocked_ekf.init(cfg, 1)
    specs = blocked_ekf.state_sharding(mesh)
    state = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs)
    Q = jnp.diag(jnp.array([1e-4] * 3, jnp.float32))
    R = jnp.diag(jnp.array([1e-3] * 2, jnp.float32))

    out = runner(state, wl, Q, R, jnp.int32(0), T)
    float(out.mean_r[0, 0])
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = runner(out, wl, Q, R, jnp.int32(T), T)
        float(out.mean_r[0, 0])
        best = min(best, time.time() - t0)
    return {"N": N, "assoc": "unknown" if unknown else "known",
            "meas_unroll": unroll, "ticks_per_s": round(T / best, 2)}


def main():
    rows = []
    for unknown in (False, True):
        for unroll in (False, True):
            log(f"N=2048 unknown={unknown} unroll={unroll} ...")
            row = run_variant(2048, 8, 50, unknown, unroll)
            log(str(row))
            rows.append(row)
    ab = {}
    for r in rows:
        ab.setdefault(r["assoc"], {})[r["meas_unroll"]] = r["ticks_per_s"]
    print(json.dumps({
        "metric": "deferred_meas_unroll_ab",
        "value": ab["known"].get(True),
        "unit": "ticks/s (known, unrolled)",
        "speedup_known": round(ab["known"][True] / ab["known"][False], 3),
        "speedup_unknown": round(
            ab["unknown"][True] / ab["unknown"][False], 3),
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
