"""The fused Pallas measurement-scan kernel vs the XLA scan lowering.

ops/pallas/seq_scan.py runs the deferred tick's ENTIRE per-measurement
loop as one kernel (interpret mode here). Contract: identical sequential
semantics to the XLA scan path of `_make_sharded_deferred` at map=1 —
same association decisions, same op buffers, same final state — up to
f32 summation order and the kernel's polynomial atan2 (~2e-7).

Reference analog of the loop under test: nuslam/src/slam.cpp:116-170
(the sequential per-measurement EKF update loop).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding

from shermbot_navigation_tpu.models.ekf_slam import EKFConfig
from shermbot_navigation_tpu.parallel import bigmap, blocked_ekf
from shermbot_navigation_tpu.parallel.mesh import make_mesh

N, M, T = 64, 4, 16


def _run(maker, **kw):
    mesh = make_mesh(jax.devices()[:1], data=1)
    cfg = EKFConfig(num_landmarks=N)
    wl = bigmap.make_workload(N, T, M, jax.random.PRNGKey(0))
    Q = jnp.diag(jnp.array([1e-4] * 3, jnp.float32))
    R = jnp.diag(jnp.array([1e-3] * 2, jnp.float32))
    st = blocked_ekf.init(cfg, 1)
    specs = blocked_ekf.state_sharding(mesh)
    st = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), st, specs)
    runner = maker(cfg, mesh, 1, M, deferred=True, **kw)
    return runner(st, wl, Q, R, jnp.int32(0), T)


@pytest.mark.parametrize("maker", [bigmap.make_runner,
                                   bigmap.make_unknown_runner],
                         ids=["known", "unknown"])
def test_seq_kernel_matches_xla_scan(maker):
    a = _run(maker, seq_kernel=False)
    b = _run(maker, seq_kernel=True, seq_interpret=True)
    # discrete decisions must agree exactly
    np.testing.assert_array_equal(np.asarray(a.n_seen), np.asarray(b.n_seen))
    np.testing.assert_array_equal(np.asarray(a.seen), np.asarray(b.seen))
    # continuous state to f32 summation-order / poly-atan2 tolerance
    np.testing.assert_allclose(a.mean_r, b.mean_r, atol=1e-5)
    np.testing.assert_allclose(a.mean_m, b.mean_m, atol=1e-5)
    np.testing.assert_allclose(a.cov_rr, b.cov_rr, atol=1e-6)
    np.testing.assert_allclose(a.cov_rm, b.cov_rm, atol=1e-6)
    np.testing.assert_allclose(a.cov_mm, b.cov_mm, atol=1e-6)


def test_seq_kernel_rejects_multi_shard():
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs >= 2 devices")
    mesh = make_mesh(devs[:2], data=1)
    cfg = EKFConfig(num_landmarks=N)
    with pytest.raises(ValueError, match="seq_kernel"):
        blocked_ekf.make_sharded_deferred_step(cfg, mesh, 1, M,
                                               seq_kernel=True)
