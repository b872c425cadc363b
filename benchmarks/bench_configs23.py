#!/usr/bin/env python
"""BASELINE configs 2 and 3 on-chip vs the same-session C++ baseline.

Config 2 (`course12_noisy`): 12-landmark course, slip + sensor noise,
UNKNOWN association (Mahalanobis first-hit gating) — the reference's
`unknown_data_assoc.launch` workload driven by /fake_sensor.
Config 3 (`lidar20_full`): the full perception stack — 360-ray lidar
simulation -> adjacent-range clustering -> inscribed-angle classification
-> Hyperaccurate circle fit -> EKF — the reference's hot kernel chain
(/root/reference/nuslam/src/landmarks.cpp:68-118 driving
/root/reference/nuslam/src/circle_fit_library.cpp:15-134 at 10 Hz).

Methodology identical to bench.py (the config-1 headline): the TPU engine
runs B independent worlds in one jitted scan, timed best-of-3 after
warmup with a scalar-sum sync; the C++ baseline is a same-session
median-of-5 with its spread. This bench exists because rounds 1-3 only
ever measured config 1 on-chip: the perception stack (segmented-scan
clustering, vmapped 4x4 Jacobi eigendecompositions) had zero recorded
TPU throughput (VERDICT r03 item 1).

Run ALONE: python benchmarks/bench_configs23.py
Prints one JSON line.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
BASELINE_DIR = os.path.join(REPO, "native", "baseline")
BASELINE_BIN = os.path.join(BASELINE_DIR, "baseline")


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def measure_cpp(scenario, runs=5):
    if not os.path.exists(BASELINE_BIN):
        subprocess.run(["make"], cwd=BASELINE_DIR, check=True,
                       capture_output=True)
    samples, ate = [], None
    for _ in range(runs):
        out = subprocess.run(
            [BASELINE_BIN, "--scenario", scenario, "--deterministic",
             "--repeat", "5"],
            check=True, capture_output=True, text=True)
        r = json.loads(out.stdout.strip())
        samples.append(r["ticks_per_sec"])
        ate = r["ate"]
    samples.sort()
    return {"ticks_per_sec": samples[len(samples) // 2],
            "spread": [samples[0], samples[-1]], "ate": ate}


def measure_tpu(scenario, batch):
    import jax
    import jax.numpy as jnp

    from shermbot_navigation_tpu.pipeline import driver, metrics
    from shermbot_navigation_tpu.pipeline.config import get_scenario

    scn = get_scenario(scenario)

    def timed(key):
        t0 = time.time()
        o = driver.run_scenario_batch(scn, jax.random.split(key, batch))
        float(jnp.sum(o.slam_pose))       # scalar sync through the tunnel
        return time.time() - t0, o

    log(f"{scenario}: compiling batch={batch} ...")
    timed(jax.random.PRNGKey(0))          # compile + warmup
    best, outs = float("inf"), None
    for i in range(1, 4):
        dt, o = timed(jax.random.PRNGKey(i))
        if dt < best:
            best, outs = dt, o
    ticks = batch * scn.steps / best
    # per-world ATE quantiles, reduced ON DEVICE (BENCH_NOTES pathology
    # 8: never fetch big buffers through the tunnel). Batch-pooled RMSE
    # is NOT reported as "the" ATE: the reference's first-hit gating
    # under sensor noise diverges ~1% of worlds (measured on CPU: 9-17
    # of 1024 worlds > 1 m, median 0.133 — the tail the reference's own
    # README admits as data-association bugs), and pooled RMSE is
    # dominated by that tail. Median world vs the C++ single-trajectory
    # deterministic ATE is the apples-to-apples quality row; the tail is
    # reported alongside.
    ate_w = jnp.sqrt(jnp.mean(jnp.sum(
        (outs.slam_pose[..., 1:] - outs.true_pose[..., 1:]) ** 2, -1), -1))
    ate_med = float(jnp.median(ate_w))
    ate_p99 = float(jnp.quantile(ate_w, 0.99))
    frac_diverged = float(jnp.mean((ate_w > 1.0).astype(jnp.float32)))
    ate_odom = float(metrics.ate(outs.odom_pose[..., 1:],
                                 outs.true_pose[..., 1:]))
    return {"ticks_per_sec": round(ticks, 1),
            "ate_median_world": round(ate_med, 6),
            "ate_p99_world": round(ate_p99, 6),
            "frac_worlds_diverged_gt1m": round(frac_diverged, 5),
            "ate_odom": round(ate_odom, 6), "batch": batch,
            "seconds_per_batch_run": round(best, 3)}


def main():
    rows = []
    points = [("course12_noisy",
               int(os.environ.get("BENCH23_BATCH2", "2048"))),
              ("lidar20_full",
               int(os.environ.get("BENCH23_BATCH3", "1024")))]
    only = os.environ.get("BENCH23_SCENARIOS")
    if only:
        keep = only.split(",")
        points = [p for p in points if p[0] in keep]
    for scenario, batch in points:
        cpp = measure_cpp(scenario)
        log(f"{scenario}: C++ median {cpp['ticks_per_sec']:.0f} ticks/s "
            f"spread {cpp['spread']}")
        tpu = measure_tpu(scenario, batch)
        row = {"scenario": scenario, "tpu": tpu, "cpp": cpp,
               "vs_baseline": round(
                   tpu["ticks_per_sec"] / cpp["ticks_per_sec"], 2)}
        log(str(row))
        rows.append(row)
    print(json.dumps({
        "metric": "configs23_ticks_per_sec_per_chip",
        "value": rows[-1]["tpu"]["ticks_per_sec"],
        "unit": "ticks/s (lidar20_full, full perception stack)",
        "rows": rows}))


if __name__ == "__main__":
    main()
