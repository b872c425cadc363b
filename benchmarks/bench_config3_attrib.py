#!/usr/bin/env python
"""Config-3 tick attribution: where does the lidar pipeline's time go?

The r05 engine A/B showed config 3 gets only 1.10x from the batch-on-lanes
EKF layout (vs 2.79x on config 2) — the hypothesis being that the tick is
dominated by the non-EKF stages. This bench measures three nested jitted
programs on-chip at the production batch and differences them:

    sim       — tube-world dynamics substeps + observe (360-ray lidar)
    sim+perc  — + clustering -> classification -> circle fit
    full      — + the EKF tick (run_scenario_batch_lanes)

Each variant consumes its outputs into a scalar (unused lax.scan outputs
are NOT DCE'd, but unconsumed stages feeding nothing would be — each
program returns sums of the stage outputs it claims to run).

Run ALONE: python benchmarks/bench_config3_attrib.py
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


B = int(os.environ.get("ATTRIB_BATCH", "1024"))
SCN = os.environ.get("ATTRIB_SCENARIO", "lidar20_full")


def build(variant):
    import functools

    from shermbot_navigation_tpu.pipeline import driver
    from shermbot_navigation_tpu.pipeline.config import get_scenario
    from shermbot_navigation_tpu.sim import tube_world as tw

    scn = get_scenario(SCN)
    dtype = jnp.float32
    params = scn.world_params(dtype)
    wcfg = scn.world_config()
    T = scn.steps

    if variant == "full":
        @jax.jit
        def run(keys):
            o = driver.run_scenario_batch_lanes(scn, keys)
            return jnp.sum(o.slam_pose)
        return run, scn

    if variant == "sim":
        def one(key):
            st = driver.init_pipeline(scn, dtype)._replace(key=key)
            cmds = driver.command_twist(scn, jnp.arange(T), dtype)

            def body(carry, cmd):
                world, key = carry
                key, k_obs, *subkeys = jax.random.split(
                    key, scn.sim_substeps + 2)

                def sim_body(wst, k):
                    return tw.step_dynamics(wcfg, params, wst, cmd,
                                            scn.dt, k), None

                world, _ = jax.lax.scan(sim_body, world,
                                        jnp.stack(subkeys), unroll=True)
                obs = tw.observe(wcfg, params, world, k_obs)
                return (world, key), (jnp.sum(obs.scan)
                                      + jnp.sum(obs.true_pose))

            _, outs = jax.lax.scan(body, (st.world, st.key), cmds)
            return jnp.sum(outs)

        return jax.jit(lambda keys: jnp.sum(jax.vmap(one)(keys))), scn

    if variant in ("sim+cluster", "sim+cluster+classify",
                   "sim+cluster+fit"):
        from shermbot_navigation_tpu.ops.circle_fit import fit_circles
        from shermbot_navigation_tpu.ops.clustering import (
            classify_clusters, cluster_scan)

        def one(key):
            st = driver.init_pipeline(scn, dtype)._replace(key=key)
            cmds = driver.command_twist(scn, jnp.arange(T), dtype)

            def body(carry, cmd):
                world, key = carry
                key, k_obs, *subkeys = jax.random.split(
                    key, scn.sim_substeps + 2)

                def sim_body(wst, k):
                    return tw.step_dynamics(wcfg, params, wst, cmd,
                                            scn.dt, k), None

                world, _ = jax.lax.scan(sim_body, world,
                                        jnp.stack(subkeys), unroll=True)
                obs = tw.observe(wcfg, params, world, k_obs)
                cl = cluster_scan(obs.scan, params.scan_min,
                                  params.scan_max,
                                  max_clusters=scn.max_clusters,
                                  max_points=scn.max_cluster_points)
                out = (jnp.sum(cl.points) + jnp.sum(cl.counts)
                       + jnp.sum(obs.true_pose))
                if "classify" in variant:
                    out = out + jnp.sum(classify_clusters(cl))
                if "fit" in variant:
                    f = fit_circles(cl)
                    out = out + jnp.sum(f.center) + jnp.sum(f.valid)
                return (world, key), out

            _, outs = jax.lax.scan(body, (st.world, st.key), cmds)
            return jnp.sum(outs)

        return jax.jit(lambda keys: jnp.sum(jax.vmap(one)(keys))), scn

    assert variant == "sim+perc"

    def one(key):
        from shermbot_navigation_tpu.pipeline.driver import (SenseState,
                                                             sense_tick)
        st = driver.init_pipeline(scn, dtype)._replace(key=key)
        cmds = driver.command_twist(scn, jnp.arange(T), dtype)

        def body(carry, cmd):
            sense, _, zs, valid, obs = sense_tick(scn, params, carry, cmd)
            return sense, (jnp.sum(zs) + jnp.sum(valid)
                           + jnp.sum(obs.true_pose))

        _, outs = jax.lax.scan(
            body, SenseState(st.world, st.odom, st.key), cmds)
        return jnp.sum(outs)

    from shermbot_navigation_tpu.pipeline import driver as _d
    return jax.jit(lambda keys: jnp.sum(jax.vmap(one)(keys))), scn


def measure(variant):
    run, scn = build(variant)
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    def timed(i):
        k = jax.random.split(jax.random.PRNGKey(i), B)
        t0 = time.time()
        float(run(k))
        return time.time() - t0

    log(f"{variant}: compiling ...")
    timed(0)
    best = min(timed(i) for i in (1, 2, 3))
    ticks = B * scn.steps / best
    return {"variant": variant, "seconds": round(best, 3),
            "ticks_per_s": round(ticks, 1)}


def main():
    variants = os.environ.get(
        "ATTRIB_VARIANTS", "sim,sim+perc,full").split(",")
    rows = [measure(v) for v in variants]
    if set(variants) != {"sim", "sim+perc", "full"}:
        for r in rows:
            log(str(r))
        print(json.dumps({"metric": "config3_tick_attribution_sub",
                          "value": rows[-1]["ticks_per_s"],
                          "unit": f"ticks/s ({variants[-1]}, B={B})",
                          "rows": rows}))
        return
    for r in rows:
        log(str(r))
    t = {r["variant"]: r["seconds"] for r in rows}
    total = t["full"]
    attrib = {
        "sim_pct": round(100 * t["sim"] / total, 1),
        "perception_pct": round(100 * (t["sim+perc"] - t["sim"]) / total, 1),
        "ekf_pct": round(100 * (total - t["sim+perc"]) / total, 1),
    }
    print(json.dumps({
        "metric": "config3_tick_attribution",
        "value": rows[-1]["ticks_per_s"],
        "unit": f"ticks/s (full {SCN}, B={B}, lanes engine)",
        "rows": rows, "attribution": attrib,
    }))


if __name__ == "__main__":
    main()
