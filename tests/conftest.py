"""Test harness configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding paths
(``jax.sharding.Mesh`` + ``shard_map``) are exercised without TPU hardware,
and with x64 enabled so reference-parity tests can check against float64
ground truth (the C++ reference is all-double).

IMPORTANT: the axon sitecustomize opens a TPU-tunnel session in EVERY python
process at interpreter startup (before this file runs), and concurrent
sessions serialize against each other — a pytest run can starve a TPU
benchmark running in parallel. To run tests while the chip is busy, invoke
as ``PALLAS_AXON_POOL_IPS= python -m pytest ...`` (empty var skips the
tunnel registration entirely; tests are CPU-only anyway).
"""

import os
import sys

# Must happen before jax is imported anywhere. The environment exports
# JAX_PLATFORMS=axon (the remote-TPU tunnel), so an unconditional override is
# required — setdefault would silently leave tests running over the tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The axon sitecustomize registers the TPU-tunnel backend and overwrites
# jax_platforms during import, so the env var alone is not enough — force the
# platform list again post-import or every test op round-trips the tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
