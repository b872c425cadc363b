#!/usr/bin/env python
"""Floor-corrected layout micro for the deferred scan body (r03 follow-up).

bench_strip_probe.py's micro measured ~130 us/op for ALL THREE layouts —
which is exactly the ~27 ms dispatch floor / 200 iters: the probe timed
whole program calls and never removed the floor, so it measured nothing.
This one solves the floor out with two scan depths (the roofline method)
and measures the ACTUAL ops the deferred scan body runs per measurement:

1. `colat`: the col_at reconstruction inner op, both layouts —
   b222:  einsum("npq,rq->npr", K (Nl,2,2), hs (2,2)), M=8 chained
   comp4: the same contraction on (4, Nl) component rows
2. `sht`:  the SHt_m build — einsum("npk,qk->npq", cols5 (Nl,2,5), H5 (2,5))
   vs the componentwise 10-mult form on (Nl,) vectors
3. `bufwr`: dynamic_update_index_in_dim into the (M, Nl, 2, 2) op buffer
   (scan-carried, minor dims tile-pad (2,2)->(8,128)) vs an (M*4, Nl)
   flat buffer (no pad)

Run ALONE: python benchmarks/bench_strip_probe2.py
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
from functools import partial


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def t_call(fn, x, reps=5):
    jax.block_until_ready(fn(x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(x))
        best = min(best, time.perf_counter() - t0)
    return best


def per_iter_us(make_fn, x, L1=50, L2=400):
    """Solve the dispatch floor out of a scanned op chain: per-iter time =
    (t(L2) - t(L1)) / (L2 - L1)."""
    f1, f2 = make_fn(L1), make_fn(L2)
    tA, tB = t_call(f1, x), t_call(f2, x)
    return (tB - tA) / (L2 - L1) * 1e6


def colat_b222(Nl=2048, M=8):
    rng = np.random.default_rng(0)
    K = jnp.asarray(rng.normal(size=(M, Nl, 2, 2)).astype(np.float32) * 1e-3)
    hs = jnp.asarray(rng.normal(size=(M, 2, 2)).astype(np.float32))

    def make(L):
        @jax.jit
        def run(col):
            def body(col, _):
                for i in range(M):
                    corr = jnp.einsum("npq,rq->npr", K[i], hs[i])
                    col = col - 1e-6 * corr
                return col, None
            col, _ = jax.lax.scan(body, col, None, length=L)
            return col
        return run
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(Nl, 2, 2)).astype(np.float32))
    return make, x


def colat_comp4(Nl=2048, M=8):
    rng = np.random.default_rng(0)
    K = jnp.asarray(rng.normal(size=(M, 4, Nl)).astype(np.float32) * 1e-3)
    hs = jnp.asarray(rng.normal(size=(M, 2, 2)).astype(np.float32))

    def make(L):
        @jax.jit
        def run(col):
            def body(col, _):
                for i in range(M):
                    k00, k01, k10, k11 = K[i, 0], K[i, 1], K[i, 2], K[i, 3]
                    h = hs[i]
                    c00, c01, c10, c11 = col[0], col[1], col[2], col[3]
                    # corr[n,p,r] = sum_q K[n,p,q] * hs[r,q]
                    o00 = k00 * h[0, 0] + k01 * h[0, 1]
                    o01 = k00 * h[1, 0] + k01 * h[1, 1]
                    o10 = k10 * h[0, 0] + k11 * h[0, 1]
                    o11 = k10 * h[1, 0] + k11 * h[1, 1]
                    col = col - 1e-6 * jnp.stack([o00, o01, o10, o11])
                return col, None
            col, _ = jax.lax.scan(body, col, None, length=L)
            return col
        return run
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(4, Nl)).astype(np.float32))
    return make, x


def sht_b222(Nl=2048):
    rng = np.random.default_rng(0)
    cols5 = jnp.asarray(rng.normal(size=(Nl, 2, 5)).astype(np.float32))

    def make(L):
        @jax.jit
        def run(h5):
            def body(h5, _):
                sht = jnp.einsum("npk,qk->npq", cols5, h5)  # (Nl, 2, 2)
                return h5 + 1e-12 * jnp.sum(sht), None
            h5, _ = jax.lax.scan(body, h5, None, length=L)
            return h5
        return run
    return make, jnp.asarray(rng.normal(size=(2, 5)).astype(np.float32))


def sht_comp(Nl=2048):
    rng = np.random.default_rng(0)
    c5 = jnp.asarray(rng.normal(size=(10, Nl)).astype(np.float32))

    def make(L):
        @jax.jit
        def run(h5):
            def body(h5, _):
                outs = []
                for p in range(2):
                    for q in range(2):
                        acc = c5[5 * p] * h5[q, 0]
                        for k in range(1, 5):
                            acc = acc + c5[5 * p + k] * h5[q, k]
                        outs.append(acc)
                sht = jnp.stack(outs)                      # (4, Nl)
                return h5 + 1e-12 * jnp.sum(sht), None
            h5, _ = jax.lax.scan(body, h5, None, length=L)
            return h5
        return run
    return make, jnp.asarray(rng.normal(size=(2, 5)).astype(np.float32))


def bufwr_padded(Nl=2048, M=8):
    rng = np.random.default_rng(0)
    sl = jnp.asarray(rng.normal(size=(Nl, 2, 2)).astype(np.float32))

    def make(L):
        @jax.jit
        def run(buf):
            def body(carry, i):
                buf, = carry
                j = jnp.mod(i, M)
                buf = jax.lax.dynamic_update_index_in_dim(
                    buf, sl * (1.0 + 1e-6 * i.astype(jnp.float32)), j, axis=0)
                return (buf,), None
            (buf,), _ = jax.lax.scan(
                body, (buf,), jnp.arange(L, dtype=jnp.int32))
            return buf
        return run
    return make, jnp.zeros((M, Nl, 2, 2), jnp.float32)


def bufwr_flat(Nl=2048, M=8):
    rng = np.random.default_rng(0)
    sl = jnp.asarray(rng.normal(size=(4, Nl)).astype(np.float32))

    def make(L):
        @jax.jit
        def run(buf):
            def body(carry, i):
                buf, = carry
                j = jnp.mod(i, M) * 4
                buf = jax.lax.dynamic_update_slice_in_dim(
                    buf, sl * (1.0 + 1e-6 * i.astype(jnp.float32)), j, axis=0)
                return (buf,), None
            (buf,), _ = jax.lax.scan(
                body, (buf,), jnp.arange(L, dtype=jnp.int32))
            return buf
        return run
    return make, jnp.zeros((M * 4, Nl), jnp.float32)


def main():
    out = {}
    for name, builder in (
            ("colat_b222_M8", colat_b222), ("colat_comp4_M8", colat_comp4),
            ("sht_b222", sht_b222), ("sht_comp", sht_comp),
            ("bufwr_padded", bufwr_padded), ("bufwr_flat", bufwr_flat)):
        make, x = builder()
        us = per_iter_us(make, x)
        out[name] = round(us, 2)
        log(f"{name}: {us:.2f} us/iter")
    print(json.dumps({
        "metric": "strip_layout_micro_floor_corrected",
        "value": out.get("colat_b222_M8"),
        "unit": "us per col_at reconstruction (M=8 chain, b222 layout)",
        "ops_us": out,
    }))


if __name__ == "__main__":
    main()
