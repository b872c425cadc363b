#!/usr/bin/env python
"""Config-1 DP batch sweep in ONE session: how throughput scales with the
data-parallel batch (the real throughput lever, BENCH_NOTES) on a single
chip. Complements bench.py's single-point headline for the README's
measured-performance story (VERDICT r02 item 8).

Run ALONE: python benchmarks/bench_dp_sweep.py
Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def log(msg):
    print(msg, file=sys.stderr, flush=True)


ENGINE = os.environ.get("BENCH_ENGINE", "lanes")  # bench.py's knob


def measure_batch(B, repeats=3):
    from shermbot_navigation_tpu.pipeline import driver
    from shermbot_navigation_tpu.pipeline.config import get_scenario

    scn = get_scenario("loop5_known")
    run = (driver.run_scenario_batch_lanes if ENGINE == "lanes"
           else driver.run_scenario_batch)

    def timed(key):
        t0 = time.time()
        o = run(scn, jax.random.split(key, B))
        float(jnp.sum(o.slam_pose))
        return time.time() - t0

    timed(jax.random.PRNGKey(0))          # compile + warmup
    best = min(timed(jax.random.PRNGKey(i)) for i in range(1, repeats + 1))
    return {"batch": B, "ticks_per_s": round(B * scn.steps / best, 1),
            "seconds": round(best, 3)}


def main():
    rows = []
    for B in (256, 1024, 2048, 8192):
        log(f"batch {B} ...")
        row = measure_batch(B)
        log(str(row))
        rows.append(row)
    best = max(rows, key=lambda r: r["ticks_per_s"])
    print(json.dumps({
        "metric": "config1_dp_batch_sweep",
        "value": best["ticks_per_s"],
        "unit": f"ticks/s (best, batch {best['batch']}, {ENGINE} engine)",
        "engine": ENGINE,
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
