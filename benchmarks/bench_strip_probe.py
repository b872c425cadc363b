#!/usr/bin/env python
"""Where do the deferred tick's 7.7 ms go? (r03 roofline: the grid pass is
~0.1 ms in steady state — the per-measurement strip scan is ~95% of the
tick.)

Probes, one session:
1. tick time vs M (1/2/4/8): if the tick is linear in M with a tiny
   intercept, the measurement scan dominates.
2. micro A/B of the suspected cause: a chain of strip ops on (Nl, 2, 2)
   batched-small-matrix layout (minor dims tile-pad (2,2)->(8,128), 128x
   physical inflation — BENCH_NOTES pathology 9's shape class) vs the SAME
   math on flat component vectors (4, Nl) (pads 2x) and (Nl*4,) (no pad).

Run ALONE: python benchmarks/bench_strip_probe.py
Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def best_time(fn, *args, reps=4):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def tick_vs_M(N=2048, T1=20, T2=100):
    from shermbot_navigation_tpu.models.ekf_slam import EKFConfig
    from shermbot_navigation_tpu.parallel import bigmap, blocked_ekf
    from shermbot_navigation_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(jax.devices()[:1], data=1)
    cfg = EKFConfig(num_landmarks=N)
    specs = blocked_ekf.state_sharding(mesh)
    Q = jnp.diag(jnp.array([1e-4] * 3, jnp.float32))
    R = jnp.diag(jnp.array([1e-3] * 2, jnp.float32))
    rows = []
    for M in (1, 2, 4, 8):
        wl = bigmap.make_workload(N, 512, M, jax.random.PRNGKey(0))
        runner = bigmap.make_runner(cfg, mesh, 1, M, deferred=True,
                                    grid_kernel=False)
        st = blocked_ekf.init(cfg, 1)
        st = jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), st, specs)
        st = runner(st, wl, Q, R, jnp.int32(0), T1)
        st = runner(st, wl, Q, R, jnp.int32(0), T2)
        float(st.mean_r[0, 0])
        tA = best_time(lambda s: runner(s, wl, Q, R, jnp.int32(0), T1), st)
        tB = best_time(lambda s: runner(s, wl, Q, R, jnp.int32(0), T2), st)
        t_tick = (tB - tA) / (T2 - T1)
        rows.append({"M": M, "tick_ms": round(t_tick * 1e3, 3)})
        log(str(rows[-1]))
    return rows


def strip_micro(Nl=2048, L=200):
    """The same rank-2 strip correction, three layouts:
    - b222: K (Nl,2,2), S (Nl,2,2) -> diag' = diag - K @ S^T   (einsum)
    - comp4: the four components as (4, Nl) rows, componentwise math
    - flat: fully flat (4*Nl,) vectors, componentwise math
    Each chained L times (data-dependent, non-foldable)."""
    rng = np.random.default_rng(0)
    K = jnp.asarray(rng.normal(size=(Nl, 2, 2)).astype(np.float32) * 1e-3)
    S = jnp.asarray(rng.normal(size=(Nl, 2, 2)).astype(np.float32) * 1e-3)
    D0 = jnp.asarray(rng.normal(size=(Nl, 2, 2)).astype(np.float32))

    @jax.jit
    def run_b222(d):
        def body(d, _):
            corr = jnp.einsum("npq,nrq->npr", K, d)
            return d - 1e-6 * corr, None
        d, _ = jax.lax.scan(body, d, None, length=L)
        return d

    Kc = jnp.asarray(np.transpose(np.asarray(K), (1, 2, 0)).reshape(4, Nl))
    Dc0 = jnp.asarray(np.transpose(np.asarray(D0), (1, 2, 0)).reshape(4, Nl))

    @jax.jit
    def run_comp4(d):
        # d, K as rows [pp, pq, qp, qq]; corr = K @ d^T per n, componentwise
        k00, k01, k10, k11 = Kc[0], Kc[1], Kc[2], Kc[3]

        def body(d, _):
            d00, d01, d10, d11 = d[0], d[1], d[2], d[3]
            c00 = k00 * d00 + k01 * d01
            c01 = k00 * d10 + k01 * d11
            c10 = k10 * d00 + k11 * d01
            c11 = k10 * d10 + k11 * d11
            return d - 1e-6 * jnp.stack([c00, c01, c10, c11]), None
        d, _ = jax.lax.scan(body, d, None, length=L)
        return d

    Kf = jnp.asarray(np.asarray(Kc).reshape(-1))
    Df0 = jnp.asarray(np.asarray(Dc0).reshape(-1))

    @jax.jit
    def run_flat(d):
        n = Nl
        k00, k01, k10, k11 = (Kf[:n], Kf[n:2 * n], Kf[2 * n:3 * n],
                              Kf[3 * n:])

        def body(d, _):
            d00, d01, d10, d11 = (d[:n], d[n:2 * n], d[2 * n:3 * n],
                                  d[3 * n:])
            c = jnp.concatenate([
                k00 * d00 + k01 * d01, k00 * d10 + k01 * d11,
                k10 * d00 + k11 * d01, k10 * d10 + k11 * d11])
            return d - 1e-6 * c, None
        d, _ = jax.lax.scan(body, d, None, length=L)
        return d

    out = {}
    for name, fn, x in (("b222", run_b222, D0), ("comp4", run_comp4, Dc0),
                        ("flat", run_flat, Df0)):
        t = best_time(fn, x) / L
        out[name] = {"op_us": round(t * 1e6, 2)}
        log(f"{name}: {out[name]}")
    return out


def main():
    log("tick vs M ...")
    rows = tick_vs_M()
    log("strip micro ...")
    micro = strip_micro()
    m1 = rows[0]["tick_ms"]
    m8 = rows[-1]["tick_ms"]
    print(json.dumps({
        "metric": "deferred_tick_decomposition",
        "value": round((m8 - m1) / 7.0, 3),
        "unit": "ms per additional measurement (N=2048)",
        "tick_vs_M": rows,
        "strip_layout_micro": micro,
    }))


if __name__ == "__main__":
    main()
