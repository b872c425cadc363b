#!/usr/bin/env python
"""The PRODUCTION auto-routed config-4 path (seq-scan kernel + Pallas grid
pass, parallel/bigmap auto rules) measured end-to-end for both association
modes and up to the largest grid a single chip holds (N=16384: 4.3 GB of
comp planes). Complements bench_config4_matrix.py, which enumerates
variants explicitly.

Run ALONE: python benchmarks/bench_production_auto.py
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


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def run_point(N, M, unknown, T1, T2):  # noqa: C901
    from shermbot_navigation_tpu.models.ekf_slam import EKFConfig
    from shermbot_navigation_tpu.parallel import bigmap, blocked_ekf
    from shermbot_navigation_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(jax.devices()[:1], data=1)
    cfg = EKFConfig(num_landmarks=N)
    wl = bigmap.make_workload(N, 128, M, jax.random.PRNGKey(0))
    maker = bigmap.make_unknown_runner if unknown else bigmap.make_runner
    # PROD_DONATE=1: donate the state so the out-grid reuses the in-grid
    # allocation (peak 1x grid instead of 2x) — required at the
    # single-chip HBM edge (N >= ~20480, grid >= 6.7 GB; 2x would OOM).
    # The call chain below is linear, so donation is safe.
    donate = bool(os.environ.get("PROD_DONATE"))
    runner = maker(cfg, mesh, 1, M, donate=donate)  # defaults = production
    st = blocked_ekf.init(cfg, 1)
    specs = blocked_ekf.state_sharding(mesh)
    st = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), st, specs)
    Q = jnp.diag(jnp.array([1e-4] * 3, jnp.float32))
    R = jnp.diag(jnp.array([1e-3] * 2, jnp.float32))
    st = runner(st, wl, Q, R, jnp.int32(0), T1)
    jax.block_until_ready(st.mean_r)

    def t(T):
        # two sync rules learned the hard way (both measured as
        # tA == tB == dispatch floor otherwise): chain the state so every
        # call is unique, AND synchronize on a scalar that DEPENDS ON the
        # grid — through the tunnel, block_until_ready on one output
        # resolves when that buffer streams back, not when the program's
        # last (1-4 GB) output is written.
        nonlocal st
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            st = runner(st, wl, Q, R, jnp.int32(T1), T)
            float(st.cov_mm[0, 0, 0, 0, 0])
            best = min(best, time.perf_counter() - t0)
        return best

    tA, tB = t(T1), t(T2)
    ms = (tB - tA) / (T2 - T1) * 1e3
    grid_gb = 16 * N * N / 1e9
    return {"N": N, "assoc": "unknown" if unknown else "known",
            "ms_per_tick": round(ms, 3),
            "ticks_per_s": round(1000 / ms, 1),
            "updates_per_s": round(1000 / ms * M, 1),
            "grid_GB": round(grid_gb, 2),
            "floor2pass_ms": round(2 * grid_gb / 819 * 1e3, 2),
            "pct_of_2pass_floor": round(
                100 * (2 * grid_gb / 819 * 1e3) / ms, 1)}


def main():
    rows = []
    sizes = [int(x) for x in
             os.environ.get("PROD_SIZES", "2048,8192,16384").split(",")]
    points = [(N, unk, *((20, 120) if N == 2048 else
                         (10, 40) if N == 8192 else (5, 20)))
              for N in sizes for unk in (False, True)]
    for N, unknown, T1, T2 in points:
        log(f"N={N} unknown={unknown} ...")
        row = run_point(N, 8, unknown, T1, T2)
        log(str(row))
        rows.append(row)
    print(json.dumps({
        "metric": "config4_production_auto",
        "value": rows[0]["ticks_per_s"],
        "unit": "ticks/s (N=2048 known, production path)",
        "rows": rows}))


if __name__ == "__main__":
    main()
