"""Executed multi-process distributed path (SURVEY section 2.5 backend row).

Spawns TWO OS processes that form a real ``jax.distributed`` cluster via
``mesh.initialize_multihost`` (gloo collectives over loopback TCP), build a
mesh whose 'map' axis spans both processes, and run

- the sharded blocked-EKF tick (sequential AND the production deferred
  variant), and
- the sharded Schur Gauss-Newton refinement,

asserting shard-for-shard equality with process-local executions of the same
programs (and, for the GN step, with the single-device implementation). The
virtual-mesh tests prove the collectives' math; this one proves the
multi-host runtime path — coordinator bring-up, cross-process collectives,
global-array construction — actually executes.
"""

import os
import socket
import subprocess
import sys



HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cluster():
    port = _free_port()
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""   # never open a TPU tunnel from workers
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=HERE)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"pid={pid} MULTIHOST_OK" in out, out
