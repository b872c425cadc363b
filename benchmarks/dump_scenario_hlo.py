#!/usr/bin/env python
"""Dump the optimized TPU HLO of a scenario rollout (run_scenario_batch)
and summarize its computations: instruction counts per while-body and the
biggest-shape ops. Built to diagnose the config-2/3 on-chip tick cost
(r04: course12_noisy measured 54 ms/tick at B=256 — config 1 runs 1.7 ms
at B=2048 — before any batching argument, find out WHAT the tick lowers
to). Same parser as dump_deferred_hlo.py.

Env: HLO_SCENARIO (default course12_noisy), HLO_B (default 256).
Run ALONE (opens a tunnel session). Writes
/tmp/<scenario>_B<B>.hlo.txt and prints a JSON summary line.
"""

import json
import os
import re
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

SCENARIO = os.environ.get("HLO_SCENARIO", "course12_noisy")
B = int(os.environ.get("HLO_B", "256"))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def shape_bytes(shape_str):
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
    from shermbot_navigation_tpu.pipeline import driver
    from shermbot_navigation_tpu.pipeline.config import get_scenario

    scn = get_scenario(SCENARIO)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    engine = os.environ.get("HLO_ENGINE", "vmapped")
    run = (driver.run_scenario_batch_lanes if engine == "lanes"
           else driver.run_scenario_batch)
    log(f"lowering {SCENARIO} B={B} steps={scn.steps} engine={engine} ...")
    # run_scenario_batch wraps a jitted rollout; lower the same callable
    fn = jax.jit(lambda ks: run(scn, ks))
    lowered = fn.lower(keys)
    log("compiling ...")
    compiled = lowered.compile()
    txt = compiled.as_text()
    path = f"/tmp/{SCENARIO}_B{B}.hlo.txt"
    with open(path, "w") as f:
        f.write(txt)
    log(f"HLO: {len(txt.splitlines())} lines -> {path}")

    comps = re.split(r"\n(?=%?\w[\w.\-]* \([^)]*\) -> )|\n(?=ENTRY )", txt)
    summary = []
    for comp in comps:
        header = comp.splitlines()[0] if comp.splitlines() else ""
        if "body" not in header and "while" not in header:
            continue
        kinds = defaultdict(int)
        big = []
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
            if b > 1 << 20:
                big.append((op, shape.strip(), b))
        if kinds:
            summary.append({
                "computation": header[:100],
                "n_instructions": sum(kinds.values()),
                "kinds": dict(sorted(kinds.items(), key=lambda kv: -kv[1])),
                "big_outputs": [
                    {"op": o, "shape": s[:80], "MB": round(b / 1e6, 1)}
                    for o, s, b in sorted(big, key=lambda x: -x[2])[:8]],
            })
    summary.sort(key=lambda c: -c["n_instructions"])
    print(json.dumps({"metric": "scenario_hlo_summary",
                      "scenario": SCENARIO, "B": B,
                      "computations": summary[:6]}, indent=1))


if __name__ == "__main__":
    main()
