"""Worker process for the 2-process multi-host test (test_multihost.py).

Runs as one of two OS processes; together they form a real
``jax.distributed`` cluster (gloo collectives over loopback TCP) with 4
virtual CPU devices each. The 'map' mesh axis spans BOTH processes, so
every collective in the sharded blocked-EKF step and the sharded Schur GN
refinement crosses a genuine process boundary — the strongest executable
evidence for the multi-host path short of pod hardware (SURVEY section 2.5
distributed-backend row; the reference's own multi-machine story is an
empty launch-file placeholder, unknown_data_assoc.launch:23-24).

Usage: python multihost_worker.py <process_id> <num_processes> <port>
Prints MULTIHOST_OK on success; any assertion failure exits nonzero.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from shermbot_navigation_tpu.models import ekf_slam as ekf  # noqa: E402
from shermbot_navigation_tpu.models import schur  # noqa: E402
from shermbot_navigation_tpu.parallel import (  # noqa: E402
    blocked_ekf, mesh as mesh_lib, schur_dist)

N = 16   # landmark capacity (2 slots per map shard at map=8)
M = 3    # measurements per tick
B = 2    # batch
TICKS = 4


def put(tree, mesh, specs):
    """Host tree -> global arrays on a (possibly multi-process) mesh."""
    def one(x, spec):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, NamedSharding(mesh, spec), lambda idx: x[idx])
    return jax.tree_util.tree_map(one, tree, specs)


def check_shards(global_arr, full, atol, what):
    """Compare every addressable shard of a global array to the slice of a
    locally-computed full array."""
    for sh in global_arr.addressable_shards:
        np.testing.assert_allclose(np.asarray(sh.data), full[sh.index],
                                   atol=atol, err_msg=what)


def make_inputs(seed=0, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    twists = jnp.asarray(rng.uniform(-0.05, 0.05, (B, TICKS, 3)), dtype)
    zs = jnp.asarray(
        np.stack([rng.uniform(0.3, 1.0, (B, TICKS, M)),
                  rng.uniform(-3, 3, (B, TICKS, M))], axis=-1), dtype)
    valid = jnp.asarray(rng.uniform(size=(B, TICKS, M)) < 0.9)
    ids = np.zeros((B, TICKS, M), np.int32)
    for t in range(TICKS):
        for k in range(M):
            ids[:, t, k] = (t + k) % 4
    return twists, zs, valid, jnp.asarray(ids)


def run_blocked(step_maker, mesh, cfg, Q, R, inputs, dtype):
    twists, zs, valid, ids = inputs
    step = step_maker(cfg, mesh, B, M)
    bst = blocked_ekf.init(cfg, B, dtype=dtype)
    specs = blocked_ekf.state_sharding(mesh)
    bst = put(bst, mesh, specs)
    for t in range(TICKS):
        bst = step(bst, twists[:, t], zs[:, t], valid[:, t], ids[:, t], Q, R)
    return bst


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    mesh_lib.initialize_multihost(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    devices = jax.devices()
    assert len(devices) == 4 * nproc

    dtype = jnp.float64
    cfg = ekf.EKFConfig(num_landmarks=N)
    Q = jnp.diag(jnp.array([0.1, 0.1, 0.1], dtype))
    R = jnp.diag(jnp.array([0.001, 0.001], dtype))
    inputs = make_inputs(dtype=dtype)

    # global mesh: 'map' axis = all 8 devices, spanning both processes
    gmesh = mesh_lib.make_mesh(devices, data=1, map_=len(devices))
    assert len({d.process_index for d in gmesh.devices.ravel()}) == nproc
    # local oracle mesh: this process's 4 devices only (same program,
    # process-local execution -> fully addressable results)
    lmesh = mesh_lib.make_mesh(jax.local_devices(), data=1, map_=4)

    for maker in (blocked_ekf.make_sharded_step,
                  blocked_ekf.make_sharded_deferred_step):
        got = run_blocked(maker, gmesh, cfg, Q, R, inputs, dtype)
        ref = run_blocked(maker, lmesh, cfg, Q, R, inputs, dtype)
        ref = jax.tree_util.tree_map(np.asarray, ref)
        name = maker.__name__
        check_shards(got.mean_r, ref.mean_r, 1e-11, f"{name}.mean_r")
        check_shards(got.mean_m, ref.mean_m, 1e-11, f"{name}.mean_m")
        check_shards(got.cov_rr, ref.cov_rr, 1e-10, f"{name}.cov_rr")
        check_shards(got.cov_rm, ref.cov_rm, 1e-10, f"{name}.cov_rm")
        check_shards(got.n_seen, ref.n_seen, 0, f"{name}.n_seen")
        check_shards(got.seen, ref.seen, 0, f"{name}.seen")
        ns = int(ref.n_seen[0])
        assert ns == 4
        # landmark grid: seen blocks only (unseen keep the huge prior whose
        # last-ulp handling is not comparable across reduction orders)
        for sh in got.cov_mm.addressable_shards:
            data = np.asarray(sh.data)
            full = ref.cov_mm[sh.index]
            rows = range(*sh.index[1].indices(N))
            keep = [k for k, r in enumerate(rows) if r < ns]
            if keep:
                np.testing.assert_allclose(
                    data[:, keep][..., :ns, :], full[:, keep][..., :ns, :],
                    atol=1e-8, err_msg=f"{name}.cov_mm")

    # ---- sharded Schur GN across the process boundary -------------------
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_refinement import TestSchur
    prob, truth, lms = TestSchur()._problem(T=24, N=16, dtype=dtype, seed=7)
    single = schur.gauss_newton_step(prob, damping=1e-6, cg_iters=80)
    part = schur_dist.partition_problem(prob, len(devices))
    step = schur_dist.make_sharded_gn(
        gmesh, T=part.poses.shape[0], N=part.landmarks.shape[0],
        M=part.obs_t.shape[0], cg_iters=80, damping=1e-6)
    in_specs = schur.BundleProblem(
        poses=P(), landmarks=P("map", None), odo_meas=P(), odo_info=P(),
        obs_t=P("map"), obs_j=P("map"), obs_z=P("map", None),
        obs_info=P(), obs_w=P("map"), anchor_w=P())
    out = step(put(part, gmesh, in_specs))
    check_shards(out.poses, np.asarray(single.poses), 1e-8, "gn.poses")
    check_shards(out.landmarks, np.asarray(single.landmarks), 1e-8,
                 "gn.landmarks")

    print(f"pid={pid} MULTIHOST_OK", flush=True)


if __name__ == "__main__":
    main()
