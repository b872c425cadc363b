#!/usr/bin/env python
"""A/B the fused Pallas measurement-scan kernel (seq_scan.py) against the
XLA scan lowering of the deferred config-4 tick, on the real chip, one
session. Parity is computed ON DEVICE (one scalar fetch per mode — a
device->host fetch of the 67 MB grid costs minutes through the tunnel,
BENCH_NOTES pathology 8). Timing uses two scan depths to cancel the
dispatch floor.

Run ALONE: python benchmarks/bench_seq_kernel.py
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

N = int(os.environ.get("SEQK_N", "2048"))
M = int(os.environ.get("SEQK_M", "8"))


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


@jax.jit
def maxdiff(a, b):
    out = jnp.float32(0)
    for f in a._fields:
        x = getattr(a, f)
        y = getattr(b, f)
        out = jnp.maximum(out, jnp.max(jnp.abs(
            x.astype(jnp.float32) - y.astype(jnp.float32))))
    return out


def main():
    from shermbot_navigation_tpu.models.ekf_slam import EKFConfig
    from shermbot_navigation_tpu.parallel import bigmap, blocked_ekf
    from shermbot_navigation_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(jax.devices()[:1], data=1)
    cfg = EKFConfig(num_landmarks=N)
    wl = bigmap.make_workload(N, 128, M, jax.random.PRNGKey(0))
    Q = jnp.diag(jnp.array([1e-4] * 3, jnp.float32))
    R = jnp.diag(jnp.array([1e-3] * 2, jnp.float32))
    specs = blocked_ekf.state_sharding(mesh)

    def fresh():
        st = blocked_ekf.init(cfg, 1)
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), st,
            specs)

    rows = []
    for maker, name in ((bigmap.make_runner, "known"),
                        (bigmap.make_unknown_runner, "unknown")):
        rx = maker(cfg, mesh, 1, M, deferred=True, seq_kernel=False)
        rk = maker(cfg, mesh, 1, M, deferred=True, seq_kernel=True)
        log(f"{name}: parity(16 ticks), device-side compare...")
        a = rx(fresh(), wl, Q, R, jnp.int32(0), 16)
        b = rk(fresh(), wl, Q, R, jnp.int32(0), 16)
        err = float(maxdiff(a, b))
        log(f"{name}: maxerr(all fields) = {err:.3e}")

        res = {"assoc": name, "N": N, "M": M, "parity_maxerr": err}
        for nm, r in (("xla", rx), ("kernel", rk)):
            st = fresh()
            st = r(st, wl, Q, R, jnp.int32(0), 20)
            jax.block_until_ready(st.mean_r)

            def t(T):
                best = 1e9
                for _ in range(3):
                    t0 = time.perf_counter()
                    s2 = r(st, wl, Q, R, jnp.int32(0), T)
                    jax.block_until_ready(s2.mean_r)
                    best = min(best, time.perf_counter() - t0)
                return best

            tA = t(20)
            tB = t(120)
            ms = (tB - tA) / 100 * 1e3
            res[f"{nm}_ms_per_tick"] = round(ms, 3)
            res[f"{nm}_ticks_per_s"] = round(1000 / ms, 1)
            log(f"{name} {nm}: {ms:.3f} ms/tick = {1000/ms:.1f} ticks/s")
        res["speedup"] = round(res["xla_ms_per_tick"]
                               / res["kernel_ms_per_tick"], 2)
        rows.append(res)

    best = max(r["kernel_ticks_per_s"] for r in rows)
    print(json.dumps({
        "metric": "seq_kernel_ab", "value": best,
        "unit": f"ticks/s (kernel, best assoc, N={N})", "rows": rows}))


if __name__ == "__main__":
    main()
