#!/usr/bin/env python
"""Serving-scale single-robot EKF on one chip: the r05 three-way A/B.

Workload (identical across modes): N=2048 landmarks, all initialized (a
converged map being SERVED; D = 3+2N = 4099), per tick predict + M=8
sequential known-id Kalman updates with zero-innovation measurements
(the state stays numerically put while every update does full-rank
work). The op is the reference's ``update`` (slam_library.cpp:263-282)
at serving scale.

Modes:

- ``dense_xla``    — the dense engine, XLA per-update schedule
                     (pallas_update='off'; the r04 production routing).
                     Sigma is read+written once PER UPDATE.
- ``dense_kernel`` — the dense engine routed through the demoted fused
                     Kalman-update kernel ('on', D padded to 4224); kept
                     for the record (r04: 0.52x the XLA schedule).
- ``serving``      — pipeline/serving.py: the deferred whole-tick path
                     (seq-scan kernel + rank-2M grid kernel, auto-routed
                     as in config-4 production). The grid is read+written
                     once PER TICK.

Ceiling accounting (VERDICT r04 item 1): the serving tick's 2-pass grid
floor is 2 x 16N^2 bytes; it is quoted against BOTH the HBM spec
(819 GB/s — the binding floor for call-per-tick serving, where the state
persists in HBM between program invocations) and the same-session
measured VMEM-regime stream rate at the identical byte count (the
in-scan regime: at N=2048 the 67 MB grid fits VMEM and XLA keeps it
there across scan iterations). Timing uses two scan depths with chained
states (tunnel traps 14a/b solved: sync on a scalar depending on the
grid; every timed dispatch is a unique (program, input)).

Run ALONE: python benchmarks/bench_dense_serving.py
Prints one JSON line -> redirect to benchmarks/results/r05_dense_serving.json
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


N = int(os.environ.get("DENSE_N", 2048))     # D = 3 + 2N = 4099
PAD = int(os.environ.get("DENSE_PAD", 4224)) # kernel mode: next mult of 128
M = 8
HBM_SPEC_GBPS = 819.0


def make_seeded_state(cfg, dtype=jnp.float32):
    """A converged serving state: every landmark initialized, small PSD
    covariance on the logical dims, zeros on any padded tail."""
    from shermbot_navigation_tpu.models import ekf_slam as ekf

    D = cfg.dim
    side = math.ceil(math.sqrt(N))
    ii = np.arange(N)
    lms = np.stack([(ii % side - side / 2) * 2.0,
                    (ii // side - side / 2) * 2.0], axis=-1)
    st = ekf.init(cfg, jnp.zeros(3, dtype), dtype=dtype)
    mean = st.mean.at[3:3 + 2 * N].set(
        jnp.asarray(lms.reshape(-1), dtype))
    diag = np.zeros(D, np.float64)
    diag[:3 + 2 * N] = 0.01
    cov = jnp.asarray(np.diag(diag), dtype)
    return st._replace(
        mean=mean, cov=cov,
        n_seen=jnp.int32(N),
        seen=st.seen.at[:N].set(True)), lms


def make_schedule(lms, T, dtype=jnp.float32):
    """Tick t updates ids [t*M, t*M+M) mod N; zs are exact h(mean)."""
    zs_of = lambda ids: np.stack(
        [np.hypot(lms[ids, 0], lms[ids, 1]),
         np.arctan2(lms[ids, 1], lms[ids, 0])], axis=-1)
    sched = (np.arange(T)[:, None] * M + np.arange(M)[None, :]) % N
    return (jnp.asarray(zs_of(sched), dtype),
            jnp.asarray(sched, jnp.int32))


def make_dense_runner(cfg, lms, T):
    from shermbot_navigation_tpu.models import ekf_slam as ekf

    dtype = jnp.float32
    zs_all, ids_all = make_schedule(lms, T, dtype)
    twist = jnp.zeros(3, dtype)
    valid = jnp.ones((M,), bool)
    Q = jnp.diag(jnp.array([1e-6] * 3, dtype))
    R = jnp.diag(jnp.array([1e-3] * 2, dtype))

    @jax.jit
    def run(st):
        def body(st, inp):
            zs, ids = inp
            return ekf.known_association_step(
                cfg, st, twist, zs, valid, ids, Q, R), None

        st, _ = jax.lax.scan(body, st, (zs_all, ids_all))
        return st

    return run


def make_serving_runner(cfg, step, lms, T):
    dtype = jnp.float32
    zs_all, ids_all = make_schedule(lms, T, dtype)
    twist = jnp.zeros((1, 3), dtype)
    valid = jnp.ones((1, M), bool)
    Q = jnp.diag(jnp.array([1e-6] * 3, dtype))
    R = jnp.diag(jnp.array([1e-3] * 2, dtype))

    @jax.jit
    def run(st):
        def body(st, inp):
            zs, ids = inp
            return step(st, twist, zs[None], valid, ids[None], Q, R), None

        st, _ = jax.lax.scan(body, st, (zs_all, ids_all))
        return st

    return run


@jax.jit
def _sync_dense(st):
    return jnp.sum(st.cov) + jnp.sum(st.mean)


@jax.jit
def _sync_blocked(st):
    return (jnp.sum(st.cov_mm) + jnp.sum(st.cov_rm) + jnp.sum(st.mean_m)
            + jnp.sum(st.mean_r))


def timed_chain(run, sync, st, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        st = run(st)
        float(sync(st))
        best = min(best, time.perf_counter() - t0)
    return best, st


def two_depth(mk_run, sync, st, T1=10, T2=50):
    runA, runB = mk_run(T1), mk_run(T2)
    st = runA(st)
    float(sync(st))
    st = runB(st)
    float(sync(st))
    tA, st = timed_chain(runA, sync, st)
    tB, st = timed_chain(runB, sync, st)
    t_tick = (tB - tA) / (T2 - T1)
    floor = max(tA - T1 * t_tick, 0.0)
    return t_tick, floor, st


def measure_dense(mode):
    from shermbot_navigation_tpu.models.ekf_slam import EKFConfig

    # symmetrize=False: reference-faithful (PARITY D5) and at serving
    # scale the symmetrize costs ~6x the rank-2 downdate itself (r04)
    pad = PAD if mode == "on" else 0
    cfg = EKFConfig(num_landmarks=N, pad_state_to=pad, pallas_update=mode,
                    symmetrize=False)
    D = cfg.dim
    st, lms = make_seeded_state(cfg)
    t_tick, floor, st = two_depth(
        lambda T: make_dense_runner(cfg, lms, T), _sync_dense, st)
    assert bool(jnp.isfinite(_sync_dense(st)))
    ups = M / t_tick
    bw = ups * 2 * 4 * D * D          # per-UPDATE pass bytes
    return {
        "mode": "dense_xla" if mode == "off" else "dense_kernel",
        "D": D,
        "tick_ms": round(t_tick * 1e3, 3),
        "ticks_per_s": round(1.0 / t_tick, 1),
        "updates_per_s": round(ups, 1),
        "rank2_update_GBps": round(bw / 1e9, 1),
        "dispatch_floor_ms": round(floor * 1e3, 1),
    }


def make_serving_runner_unknown(cfg, step, lms, T):
    dtype = jnp.float32
    zs_all, _ = make_schedule(lms, T, dtype)
    twist = jnp.zeros((1, 3), dtype)
    valid = jnp.ones((1, M), bool)
    Q = jnp.diag(jnp.array([1e-6] * 3, dtype))
    R = jnp.diag(jnp.array([1e-3] * 2, dtype))

    @jax.jit
    def run(st):
        def body(st, zs):
            return step(st, twist, zs[None], valid, Q, R), None

        st, _ = jax.lax.scan(body, st, zs_all)
        return st

    return run


def measure_serving(unknown=False):
    from shermbot_navigation_tpu.models.ekf_slam import EKFConfig
    from shermbot_navigation_tpu.parallel import bigmap, blocked_ekf
    from shermbot_navigation_tpu.parallel.mesh import make_mesh
    from shermbot_navigation_tpu.pipeline import serving

    cfg = EKFConfig(num_landmarks=N, symmetrize=False)
    mesh = make_mesh(jax.devices()[:1], data=1)
    seqk = bigmap._resolve_seq_kernel(None, N, M, mesh, 1, jnp.float32)
    gridk = bigmap._resolve_grid_kernel(None, cfg, mesh, jnp.float32)
    log(f"serving routing: seq_kernel={seqk} grid_kernel={gridk} "
        f"unknown={unknown}")
    mk = (blocked_ekf.make_sharded_deferred_unknown_step if unknown
          else blocked_ekf.make_sharded_deferred_step)
    step = mk(cfg, mesh, 1, M, grid_kernel=gridk, seq_kernel=seqk)

    dense_cfg = EKFConfig(num_landmarks=N, symmetrize=False)
    dst, lms = make_seeded_state(dense_cfg)
    st = serving.state_from_dense(dense_cfg, dst)
    mk_run = (make_serving_runner_unknown if unknown
              else make_serving_runner)
    t_tick, floor, st = two_depth(
        lambda T: mk_run(cfg, step, lms, T), _sync_blocked, st)
    assert bool(jnp.isfinite(_sync_blocked(st)))
    grid_bytes = 2 * 16 * N * N       # one read + one write of the planes
    eff_gbps = grid_bytes / t_tick / 1e9
    return {
        "mode": "serving_unknown" if unknown else "serving",
        "D": 3 + 2 * N,
        "tick_ms": round(t_tick * 1e3, 3),
        "ticks_per_s": round(1.0 / t_tick, 1),
        "updates_per_s": round(M / t_tick, 1),
        "grid_2pass_GBps": round(eff_gbps, 1),
        "dispatch_floor_ms": round(floor * 1e3, 1),
        "seq_kernel": seqk, "grid_kernel": gridk,
    }


def stream_ceiling(D=4096, L1=20, L2=120):
    """Measured stream rate at the serving byte count (67 MB buffer —
    VMEM-resident regime at this size). Non-foldable sqrt body, chained
    carry, two depths (traps 14a/b)."""
    x = jnp.ones((D, D), jnp.float32)

    def mk(L):
        @jax.jit
        def loop(c):
            def body(c, _):
                return jnp.sqrt(c * c + 1e-9), None
            c, _ = jax.lax.scan(body, c, None, length=L)
            return c
        return loop

    @jax.jit
    def _sum(c):
        return jnp.sum(c)

    loopA, loopB = mk(L1), mk(L2)
    x = loopA(x)
    float(_sum(x))
    x = loopB(x)
    float(_sum(x))

    def timed(loop, c):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            c = loop(c)
            float(_sum(c))
            best = min(best, time.perf_counter() - t0)
        return best, c

    tA, x = timed(loopA, x)
    tB, x = timed(loopB, x)
    t = (tB - tA) / (L2 - L1)
    return round(2 * 4 * D * D / t / 1e9, 1)


def main():
    log("stream ceiling at (4096, 4096)...")
    ceil = stream_ceiling()
    log(f"measured stream rate (VMEM regime): {ceil} GB/s")
    rows = []
    for mode in ("off", "on"):
        log(f"measuring dense pallas_update={mode} ...")
        row = measure_dense(mode)
        log(str(row))
        rows.append(row)
    log("measuring serving (deferred whole-tick kernels) ...")
    srow = measure_serving()
    log(str(srow))
    rows.append(srow)
    if not os.environ.get("DENSE_SKIP_UNKNOWN"):
        urow = measure_serving(unknown=True)
        log(str(urow))
        rows.append(urow)
    xla = next(r for r in rows if r["mode"] == "dense_xla")
    grid_bytes = 2 * 16 * N * N
    floor_hbm_ms = grid_bytes / (HBM_SPEC_GBPS * 1e9) * 1e3
    floor_vmem_ms = grid_bytes / (ceil * 1e9) * 1e3
    print(json.dumps({
        "metric": "dense_serving_D4099",
        "value": srow["ticks_per_s"],
        "unit": "ticks/s (predict + 8 known-id updates, serving path)",
        "N_landmarks": N,
        "stream_ceiling_GBps_vmem_regime": ceil,
        "speedup_vs_dense_xla": round(
            srow["ticks_per_s"] / xla["ticks_per_s"], 2),
        "pct_of_hbm_2pass_floor": round(
            100 * floor_hbm_ms / srow["tick_ms"], 1),
        "pct_of_vmem_stream_2pass_floor": round(
            100 * floor_vmem_ms / srow["tick_ms"], 1),
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
