"""Worker process for the 2-process multi-host test (test_multihost.py).

Runs as one of two OS processes; together they form a real
``jax.distributed`` cluster (gloo collectives over loopback TCP) with 4
virtual CPU devices each. The 'map' mesh axis spans BOTH processes, so
every collective in the sharded blocked-EKF step and the sharded Schur GN
refinement crosses a genuine process boundary — the strongest executable
evidence for the multi-host path short of pod hardware (SURVEY section 2.5
distributed-backend row; the reference's own multi-machine story is an
empty launch-file placeholder, unknown_data_assoc.launch:23-24).

Usage: python multihost_worker.py <process_id> <num_processes> <port> \
           [mode] [dir]
Modes:
  full        (default) blocked-EKF seq+deferred + sharded Schur GN vs
              process-local oracles; prints MULTIHOST_OK.
  bign        config-4-scale deferred step (N=2048, M=8) so the per-tick
              O(MN) gathers cross the process boundary at representative
              sizes; prints MULTIHOST_BIGN_OK.
  ckpt_save   run half the rollout, write a sharded checkpoint to <dir>,
              signal via <dir>/saved.<pid>, then KEEP RUNNING (the parent
              kills both workers mid-run — simulated crash).
  ckpt_resume restore the checkpoint from <dir>, finish the rollout, and
              assert bitwise equality with an uninterrupted run of the
              same program on the same mesh; prints MULTIHOST_CKPT_OK.
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


def run_ticks(step, bst, inputs, Q, R, t_range):
    twists, zs, valid, ids = inputs
    for t in t_range:
        bst = step(bst, twists[:, t], zs[:, t], valid[:, t], ids[:, t], Q, R)
    return bst


def assert_bitwise_equal(got, want, what):
    """Shard-for-shard BITWISE equality of two same-sharded global arrays."""
    for sa, sb in zip(got.addressable_shards, want.addressable_shards):
        assert sa.index == sb.index, (what, sa.index, sb.index)
        a, b = np.asarray(sa.data), np.asarray(sb.data)
        assert np.array_equal(a, b, equal_nan=True), (
            f"{what}: shard {sa.index} differs (max abs diff "
            f"{np.max(np.abs(a - b))})")


def mode_ckpt(pid, phase, save_dir):
    """Multi-host checkpoint/restart (SURVEY §5 failure-recovery row; the
    reference's only state-reset analog is set_pose, odometer.cpp:169-187).
    Uses the production deferred blocked step."""
    import time

    from shermbot_navigation_tpu.pipeline import checkpoint

    dtype = jnp.float64
    cfg = ekf.EKFConfig(num_landmarks=N)
    Q = jnp.diag(jnp.array([0.1, 0.1, 0.1], dtype))
    R = jnp.diag(jnp.array([0.001, 0.001], dtype))
    inputs = make_inputs(dtype=dtype)
    devices = jax.devices()
    gmesh = mesh_lib.make_mesh(devices, data=1, map_=len(devices))
    specs = blocked_ekf.state_sharding(gmesh)
    step = blocked_ekf.make_sharded_deferred_step(cfg, gmesh, B, M)
    init = put(blocked_ekf.init(cfg, B, dtype=dtype), gmesh, specs)
    path = os.path.join(save_dir, "blocked")
    half = TICKS // 2

    if phase == "save":
        bst = run_ticks(step, init, inputs, Q, R, range(half))
        checkpoint.save_sharded(path, bst, step=half)
        open(os.path.join(save_dir, f"saved.{pid}"), "w").close()
        print(f"pid={pid} CKPT_SAVED", flush=True)
        # keep computing so the parent's kill lands mid-run (crash sim)
        while True:
            bst = run_ticks(step, bst, inputs, Q, R, range(half, TICKS))
            time.sleep(0.2)
    else:
        bst, step_no = checkpoint.load_sharded(path, init, gmesh, specs)
        assert step_no == half, step_no
        resumed = run_ticks(step, bst, inputs, Q, R, range(half, TICKS))
        uninterrupted = run_ticks(step, init, inputs, Q, R, range(TICKS))
        for name in resumed._fields:
            assert_bitwise_equal(getattr(resumed, name),
                                 getattr(uninterrupted, name), name)
        print(f"pid={pid} MULTIHOST_CKPT_OK", flush=True)


def mode_bign(pid):
    """Deferred blocked step at config-4 scale (N=2048): the per-tick
    O(MN) HSbuf/CRbuf all_gathers cross the process boundary at
    representative sizes (VERDICT r02 weak item 5), checked shard-for-shard
    against a process-local execution of the same program."""
    from shermbot_navigation_tpu.parallel import bigmap

    dtype = jnp.float64
    N2, M2, T2 = 2048, 8, 3
    cfg = ekf.EKFConfig(num_landmarks=N2)
    Q = jnp.diag(jnp.array([1e-4] * 3, dtype))
    R = jnp.diag(jnp.array([1e-3] * 2, dtype))
    wl = bigmap.make_workload(N2, T2, M2, jax.random.PRNGKey(0), dtype=dtype)
    devices = jax.devices()
    specs = blocked_ekf.state_sharding(
        mesh_lib.make_mesh(devices, data=1, map_=len(devices)))

    results = {}
    for tag, mesh in (
        ("global", mesh_lib.make_mesh(devices, data=1, map_=len(devices))),
        ("local", mesh_lib.make_mesh(jax.local_devices(), data=1, map_=4)),
    ):
        runner = bigmap.make_runner(cfg, mesh, 1, M2, deferred=True,
                                    grid_kernel=False, dtype=dtype)
        st = put(blocked_ekf.init(cfg, 1, dtype=dtype), mesh,
                 blocked_ekf.state_sharding(mesh))
        results[tag] = runner(st, wl, Q, R, jnp.int32(0), T2)

    got, ref = results["global"], results["local"]
    ref = jax.tree_util.tree_map(np.asarray, ref)
    assert int(ref.n_seen[0]) == M2 * T2
    check_shards(got.mean_r, ref.mean_r, 1e-10, "bign.mean_r")
    check_shards(got.mean_m, ref.mean_m, 1e-10, "bign.mean_m")
    check_shards(got.cov_rr, ref.cov_rr, 1e-9, "bign.cov_rr")
    check_shards(got.cov_rm, ref.cov_rm, 1e-9, "bign.cov_rm")
    check_shards(got.n_seen, ref.n_seen, 0, "bign.n_seen")
    ns = M2 * T2
    for sh in got.cov_mm.addressable_shards:
        data = np.asarray(sh.data)
        full = ref.cov_mm[sh.index]
        rows = range(*sh.index[3].indices(N2))   # comp planes: rows axis 3
        keep = [k for k, r in enumerate(rows) if r < ns]
        if keep:
            np.testing.assert_allclose(
                data[:, :, :, keep][..., :ns], full[:, :, :, keep][..., :ns],
                atol=1e-7, err_msg="bign.cov_mm")
    print(f"pid={pid} MULTIHOST_BIGN_OK", flush=True)


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "full"
    mesh_lib.initialize_multihost(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    devices = jax.devices()
    assert len(devices) == 4 * nproc

    if mode == "bign":
        return mode_bign(pid)
    if mode in ("ckpt_save", "ckpt_resume"):
        return mode_ckpt(pid, mode.split("_")[1], sys.argv[5])
    assert mode == "full", mode

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
            rows = range(*sh.index[3].indices(N))   # planes: rows axis 3
            keep = [k for k, r in enumerate(rows) if r < ns]
            if keep:
                np.testing.assert_allclose(
                    data[:, :, :, keep][..., :ns],
                    full[:, :, :, keep][..., :ns],
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
