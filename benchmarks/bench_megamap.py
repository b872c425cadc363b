#!/usr/bin/env python
"""Config-5 benchmark: pose-graph loop closure + distributed Schur bundle
refinement on a 50,000-landmark map. Prints one JSON line."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from shermbot_navigation_tpu.models import pose_graph as pg
    from shermbot_navigation_tpu.parallel import megamap, schur_dist
    from shermbot_navigation_tpu.parallel.mesh import make_mesh
    import numpy as np

    N = int(os.environ.get("MEGAMAP_N", "50000"))
    T = int(os.environ.get("MEGAMAP_T", "512"))
    OBS = int(os.environ.get("MEGAMAP_OBS", str(max(1, (2 * N) // T // 2))))
    mesh = make_mesh(jax.devices()[:1], data=1)
    n_map = mesh.shape["map"]

    t0 = time.time()
    prob = megamap.synthesize(N, T, OBS)
    t_synth = time.time() - t0

    # stage 1: loop closure (host f64 — see pose_graph.optimize_host)
    t0 = time.time()
    g = pg.optimize_host(prob.graph, iters=5)
    t_pg = time.time() - t0

    # stage 2: sharded Schur GN refinement — all steps in ONE program
    GN_STEPS = int(os.environ.get("MEGAMAP_GN", "4"))
    bundle = prob.bundle._replace(poses=g.poses)
    part = schur_dist.partition_problem(bundle, n_map)
    step = schur_dist.make_sharded_gn(
        mesh, T=T, N=N, M=part.obs_t.shape[0], cg_iters=32,
        gn_steps=GN_STEPS)
    out = step(part)          # compile + run
    float(out.poses[0, 0])
    t0 = time.time()
    out = step(part)
    float(out.poses[0, 0])
    t_gn = (time.time() - t0) / GN_STEPS

    pe = np.asarray(out.poses[:, 1:] - prob.truth_poses[:, 1:])
    ate = float(np.sqrt(np.mean(np.sum(pe ** 2, -1))))
    lm_err = float(np.sqrt(np.mean(np.sum(
        np.asarray(out.landmarks - prob.truth_lms) ** 2, -1))))

    print(json.dumps({
        "metric": "megamap_refinement",
        "N_landmarks": N,
        "keyframes": T,
        "observations": int(part.obs_t.shape[0]),
        "gn_steps": GN_STEPS,
        "posegraph_5iters_s": round(t_pg, 3),
        "schur_gn_step_s": round(t_gn, 3),
        "refined_pose_ate_m": round(ate, 4),
        "refined_landmark_rmse_m": round(lm_err, 4),
        "synthesize_s": round(t_synth, 1),
    }))


if __name__ == "__main__":
    main()
