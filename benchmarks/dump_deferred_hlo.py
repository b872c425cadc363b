#!/usr/bin/env python
"""Dump the optimized TPU HLO of the deferred tick and summarize the while
body: which instructions live in the measurement loop, their shapes, and
the estimated bytes each touches. The r03 strip probe showed ~1 ms per
measurement that layout changes did not move — this finds where it goes.

Run ALONE (opens a tunnel session): python benchmarks/dump_deferred_hlo.py
Writes /tmp/deferred_tick.hlo.txt and prints a JSON summary line.
"""

import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding

N = int(os.environ.get("HLO_N", "2048"))
M = int(os.environ.get("HLO_M", "8"))
T = int(os.environ.get("HLO_T", "10"))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def shape_bytes(shape_str):
    """Rough byte count of an HLO shape string like f32[8,4,2048]{2,1,0}."""
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    sz = {"f32": 4, "s32": 4, "u32": 4, "pred": 1, "bf16": 2, "f64": 8,
          "s64": 8, "u8": 1}.get(dt, 4)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * sz


def main():
    from shermbot_navigation_tpu.models.ekf_slam import EKFConfig
    from shermbot_navigation_tpu.parallel import bigmap, blocked_ekf
    from shermbot_navigation_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(jax.devices()[:1], data=1)
    cfg = EKFConfig(num_landmarks=N)
    runner = bigmap.make_runner(cfg, mesh, 1, M, deferred=True,
                                grid_kernel=False)
    wl = bigmap.make_workload(N, 64, M, jax.random.PRNGKey(0))
    st = blocked_ekf.init(cfg, 1)
    specs = blocked_ekf.state_sharding(mesh)
    st = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), st, specs)
    Q = jnp.diag(jnp.array([1e-4] * 3, jnp.float32))
    R = jnp.diag(jnp.array([1e-3] * 2, jnp.float32))

    log("lower+compile ...")
    lowered = runner.lower(st, wl, Q, R, jnp.int32(0), T)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open("/tmp/deferred_tick.hlo.txt", "w") as f:
        f.write(txt)
    log(f"HLO: {len(txt.splitlines())} lines -> /tmp/deferred_tick.hlo.txt")

    # find the measurement-scan while body: the while whose trip count is M
    # (the tick loop has trip count T). Heuristic: computations whose name
    # contains 'while' / 'body'; count instruction kinds + biggest shapes.
    comps = re.split(r"\n(?=%?\w[\w.\-]* \([^)]*\) -> )|\n(?=ENTRY )", txt)
    summary = []
    for comp in comps:
        header = comp.splitlines()[0] if comp.splitlines() else ""
        if "body" not in header and "while" not in header:
            continue
        kinds = defaultdict(int)
        big = []
        fusion_bytes = 0
        for line in comp.splitlines()[1:]:
            m = re.match(r"\s*(?:ROOT )?%?[\w.\-]+ = ([\w\[\],{}\d ]+?) "
                         r"([a-z\-]+)\(", line)
            if not m:
                continue
            shape, op = m.groups()
            kinds[op] += 1
            b = 0
            for s in re.findall(r"\w+\[[\d,]*\]", shape):
                b += shape_bytes(s)
            if op in ("fusion", "dot", "copy", "transpose", "gather",
                      "dynamic-slice", "dynamic-update-slice",
                      "all-reduce", "all-gather", "custom-call"):
                fusion_bytes += b
                if b > 1 << 20:
                    big.append((op, shape.strip(), b))
        if kinds:
            summary.append({
                "computation": header[:100],
                "n_instructions": sum(kinds.values()),
                "kinds": dict(sorted(kinds.items(), key=lambda kv: -kv[1])),
                "out_bytes_of_listed_ops": fusion_bytes,
                "big_outputs": [
                    {"op": o, "shape": s[:80], "MB": round(b / 1e6, 1)}
                    for o, s, b in sorted(big, key=lambda x: -x[2])[:8]],
            })
    # order by instruction count, keep the chunkiest computations
    summary.sort(key=lambda c: -c["n_instructions"])
    print(json.dumps({"metric": "deferred_tick_hlo_summary", "N": N, "M": M,
                      "computations": summary[:6]}, indent=1))


if __name__ == "__main__":
    main()
