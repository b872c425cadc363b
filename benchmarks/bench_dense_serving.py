#!/usr/bin/env python
"""Serving-scale DENSE EKF on one chip: the fused Pallas Kalman update
(ops/pallas/cov_update.py) measured as the production path it routes for —
single-robot serving at large D (VERDICT r02 item 3; the op is the
reference's ``update``, slam_library.cpp:263-282, at scale).

Workload: N=2046 landmarks, all initialized (a converged map being
SERVED), state dim 3+2N = 4095 padded to 4096 (``pad_state_to``, the
lane-aligned shape the kernel wants). Per tick: predict + M=8 sequential
known-id updates via the production ``known_association_step``. The A/B is
``pallas_update='auto'`` (which routes D=4096 f32 on TPU through the fused
kernel) vs ``'off'`` (XLA schedule) — same session, two scan depths so the
tunnel dispatch floor separates out of the per-tick time:

    t_call(T) = floor + T * t_tick.

Unlike the grid kernel (demoted — see bigmap._resolve_grid_kernel), the
dense state is already a flat (D, D) array, so the kernel's operand layout
costs no relayout copy.

Run ALONE: python benchmarks/bench_dense_serving.py
Prints one JSON line.
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
    print(msg, file=sys.stderr, flush=True)


N = int(os.environ.get("DENSE_N", 2046))     # D = 3 + 2N = 4095 -> pad 4096
PAD = int(os.environ.get("DENSE_PAD", 4096))
M = 8


def make_seeded_state(cfg, dtype=jnp.float32):
    """A converged serving state: every landmark initialized, small PSD
    covariance on the logical dims, zeros on the padded tail."""
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


def make_runner(cfg, lms, T):
    from shermbot_navigation_tpu.models import ekf_slam as ekf

    dtype = jnp.float32
    # schedule: tick t updates ids [t*M, t*M+M) mod N; measurements are the
    # exact h(mean) of the seeded state at pose 0 (zero innovation -> the
    # state stays numerically put while every update does full-rank work)
    zs_of = lambda ids: np.stack(
        [np.hypot(lms[ids, 0], lms[ids, 1]),
         np.arctan2(lms[ids, 1], lms[ids, 0])], axis=-1)
    sched = (np.arange(T)[:, None] * M + np.arange(M)[None, :]) % N
    zs_all = jnp.asarray(zs_of(sched), dtype)             # (T, M, 2)
    ids_all = jnp.asarray(sched, jnp.int32)
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


@jax.jit
def _sync_scalar(st):
    """One scalar DEPENDING ON the big cov output (tunnel trap 14a)."""
    return jnp.sum(st.cov) + jnp.sum(st.mean)


def timed_chain(run, st, reps=3):
    """Chain the state through every timed call so each dispatch is a
    unique (program, input) — identical re-dispatches can be served from
    cache upstream of the chip (tunnel trap 14b), which collapses the
    two-depth differencing to tA == tB == floor."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        st = run(st)
        float(_sync_scalar(st))
        best = min(best, time.perf_counter() - t0)
    return best, st


def measure(mode, T1=10, T2=50):
    from shermbot_navigation_tpu.models.ekf_slam import EKFConfig

    # symmetrize=False: the reference's update is asymmetric (ours
    # defaults to re-symmetrizing as a documented deviation, PARITY D5),
    # and at serving scale the symmetrize costs a full (D, D) transpose
    # + 2 passes PER UPDATE — measured ~6x the rank-2 downdate itself
    # (r04: 9.8 ms/tick with it, both A/B modes equally). The serving
    # path measures the reference-faithful configuration.
    cfg = EKFConfig(num_landmarks=N, pad_state_to=PAD, pallas_update=mode,
                    symmetrize=False)
    st, lms = make_seeded_state(cfg)
    runA = make_runner(cfg, lms, T1)
    runB = make_runner(cfg, lms, T2)
    st = runA(st)
    float(_sync_scalar(st))                   # compile+warm A
    st = runB(st)
    float(_sync_scalar(st))                   # compile+warm B
    assert bool(jnp.isfinite(st.mean).all())
    tA, st = timed_chain(runA, st)
    tB, st = timed_chain(runB, st)
    t_tick = (tB - tA) / (T2 - T1)
    floor = max(tA - T1 * t_tick, 0.0)
    ups = M / t_tick
    bw = ups * 2 * 4 * PAD * PAD
    return {
        "mode": mode,
        "tick_ms": round(t_tick * 1e3, 3),
        "ticks_per_s": round(1.0 / t_tick, 1),
        "updates_per_s": round(ups, 1),
        "rank2_update_GBps": round(bw / 1e9, 1),
        "dispatch_floor_ms": round(floor * 1e3, 1),
    }


def stream_ceiling(D=PAD, L1=20, L2=120):
    """Non-foldable body (an affine body composes across scan iterations
    into one op — bench_stream_ceiling.py), chained carry, two depths."""
    x = jnp.ones((D, D), jnp.float32)

    def mk(L):
        @jax.jit
        def loop(c):
            def body(c, _):
                # non-foldable: |c|k+b composes once XLA proves
                # positivity (measured: implied TB/s); sqrt does not
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
    log(f"stream ceiling: {ceil} GB/s")
    rows = []
    for mode in ("off", "auto"):
        log(f"measuring pallas_update={mode} ...")
        row = measure(mode)
        log(str(row))
        rows.append(row)
    kern = next(r for r in rows if r["mode"] == "auto")
    xla = next(r for r in rows if r["mode"] == "off")
    print(json.dumps({
        "metric": "dense_serving_D4096",
        "value": kern["ticks_per_s"],
        "unit": "ticks/s (predict + 8 dense updates, pallas auto)",
        "N_landmarks": N, "D": PAD,
        "stream_ceiling_GBps": ceil,
        "speedup_vs_xla": round(
            kern["ticks_per_s"] / xla["ticks_per_s"], 3),
        "pct_of_stream_ceiling": round(
            100 * kern["rank2_update_GBps"] / ceil, 1),
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
