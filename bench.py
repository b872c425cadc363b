#!/usr/bin/env python
"""Headline benchmark: full-pipeline SLAM throughput per TPU chip vs the
measured C++ reference baseline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

The workload is BASELINE.json config 1 (5-landmark loop, known association):
each tick = 5 tube-world sim substeps (noise, collision, kinematics,
landmark sensor) + odometry + EKF predict + 5 sequential Kalman updates.
The TPU engine runs B independent worlds in lockstep (one jitted scan);
the baseline is the faithful C++ port of the reference's dense math
(native/baseline, -O2, measured fresh on this machine — the reference
publishes no numbers, BASELINE.md).
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_DIR = os.path.join(REPO, "native", "baseline")
BASELINE_BIN = os.path.join(BASELINE_DIR, "baseline")

SCENARIO = "loop5_known"
# 2048 saturated the vmapped engine (r03/r04); the lanes engine keeps
# scaling (r05_dp_sweep.json: 9.8M @ 2048 -> 15.9M @ 8192 -> 17.7M @
# 16384, flattening), so the headline batch follows the chip's best
# point.
BATCH = int(os.environ.get("BENCH_BATCH", "16384"))
# "lanes" = the batch-trailing engine (models/ekf_batch.py) — measured
# 1.36x the vmapped engine on this workload on-chip (r05_headline.json);
# "vmapped" keeps the r04 path for A/Bs.
ENGINE = os.environ.get("BENCH_ENGINE", "lanes")


def measure_cpp(runs=5):
    """Median-of-N C++ baseline with the spread recorded: the shared-box
    CPU number swings run to run (r01 67.6k, r02 82.4k), and quoting point
    values made vs_baseline look like it moved when the TPU number was
    flat. The median + spread is the honest comparison row."""
    if not os.path.exists(BASELINE_BIN):
        subprocess.run(["make"], cwd=BASELINE_DIR, check=True,
                       capture_output=True)
    samples = []
    ate = None
    for _ in range(runs):
        out = subprocess.run(
            [BASELINE_BIN, "--scenario", SCENARIO, "--deterministic",
             "--repeat", "5"],
            check=True, capture_output=True, text=True)
        r = json.loads(out.stdout.strip())
        samples.append(r["ticks_per_sec"])
        ate = r["ate"]
    samples.sort()
    return {
        "ticks_per_sec": samples[len(samples) // 2],
        "ticks_per_sec_min": samples[0],
        "ticks_per_sec_max": samples[-1],
        "ate": ate,
    }


def measure_tpu():
    import jax
    import jax.numpy as jnp

    from shermbot_navigation_tpu.pipeline import driver, metrics
    from shermbot_navigation_tpu.pipeline.config import get_scenario

    scn = get_scenario(SCENARIO)
    run = (driver.run_scenario_batch_lanes if ENGINE == "lanes"
           else driver.run_scenario_batch)

    def timed(key):
        t0 = time.time()
        o = run(scn, jax.random.split(key, BATCH))
        # force full materialization on host (block_until_ready alone has
        # proven unreliable through the axon tunnel)
        float(jnp.sum(o.slam_pose))
        return time.time() - t0, o

    timed(jax.random.PRNGKey(0))                  # compile + warmup
    best = float("inf")
    outs = None
    for i in range(1, 4):
        dt, o = timed(jax.random.PRNGKey(i))
        if dt < best:
            best, outs = dt, o
    ticks = BATCH * scn.steps / best
    ate = float(metrics.ate(outs.slam_pose[..., 1:], outs.true_pose[..., 1:]))
    return ticks, ate, best


def main():
    cpp = measure_cpp()
    tpu_ticks, tpu_ate, secs = measure_tpu()
    result = {
        "metric": "slam_pipeline_ticks_per_sec_per_chip",
        "value": round(tpu_ticks, 1),
        "unit": "ticks/s",
        "vs_baseline": round(tpu_ticks / cpp["ticks_per_sec"], 2),
        "baseline_ticks_per_sec": cpp["ticks_per_sec"],
        "baseline_spread": [cpp["ticks_per_sec_min"],
                            cpp["ticks_per_sec_max"]],
        "batch": BATCH,
        "scenario": SCENARIO,
        "engine": ENGINE,
        "tpu_ate_m": round(tpu_ate, 6),
        "cpp_ate_m": cpp["ate"],
        "seconds_per_batch_run": round(secs, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
