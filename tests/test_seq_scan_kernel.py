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


def _deferred_step_pair(cfg, known):
    """(xla_step, kernel_step) on a 1-device mesh for step-level tests."""
    mesh = make_mesh(jax.devices()[:1], data=1)
    mk = (blocked_ekf.make_sharded_deferred_step if known
          else blocked_ekf.make_sharded_deferred_unknown_step)
    xla = mk(cfg, mesh, 1, M)
    kern = mk(cfg, mesh, 1, M, seq_kernel=True, seq_interpret=True)
    st = blocked_ekf.init(cfg, 1)
    specs = blocked_ekf.state_sharding(mesh)
    st = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), st, specs)
    return st, xla, kern


def test_seq_kernel_out_of_range_id_is_noop():
    """Known association: an id outside [0, N) must be a NO-OP on both
    production paths (the XLA scan's owns-mask semantics), not silently
    clipped into slot 0 / N-1 (the advisor-flagged divergence)."""
    cfg = EKFConfig(num_landmarks=N)
    st0, xla, kern = _deferred_step_pair(cfg, known=True)
    Q = jnp.diag(jnp.array([1e-4] * 3, jnp.float32))
    R = jnp.diag(jnp.array([1e-3] * 2, jnp.float32))
    tw = jnp.zeros((1, 3), jnp.float32)
    zs = jnp.array([[[1.0, 0.1], [1.2, -0.4], [0.8, 0.9], [1.5, 2.0]]],
                   jnp.float32)                                  # (1, M, 2)
    valid = jnp.ones((1, M), bool)
    ids = jnp.array([[0, 1, N, -1]], jnp.int32)   # two bad ids
    a = xla(st0, tw, zs, valid, ids, Q, R)
    b = kern(st0, tw, zs, valid, ids, Q, R)
    # both paths: exactly 2 landmarks created, bad ids untouched
    assert int(a.n_seen[0]) == 2
    assert int(b.n_seen[0]) == 2
    np.testing.assert_array_equal(np.asarray(a.seen), np.asarray(b.seen))
    assert not bool(a.seen[0, N - 1]) and not bool(b.seen[0, N - 1])
    np.testing.assert_allclose(a.mean_r, b.mean_r, atol=1e-5)
    np.testing.assert_allclose(a.mean_m, b.mean_m, atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("gate", [0.003, 0.3, 30.0])
def test_unknown_association_decisions_agree_across_gates(seed, gate):
    """Near-gate property test (advisor): the kernel's polynomial atan2 /
    symmetric-row grid read differ from the XLA path by ~ulps, so a
    Mahalanobis distance sitting at a gate could flip a discrete decision
    between the paths. Sweep noisy measurements across gates sitting
    inside the distance distribution (R=1e-3 => noise-scaled distances
    O(1)) over several seeds and require the DECISIONS to agree exactly."""
    key = jax.random.PRNGKey(seed)
    cfg = EKFConfig(num_landmarks=N, match_gate=gate,
                    new_gate=max(10 * gate, 60.0))
    st_a, xla, kern = _deferred_step_pair(cfg, known=False)
    st_b = st_a
    Q = jnp.diag(jnp.array([1e-4] * 3, jnp.float32))
    R = jnp.diag(jnp.array([1e-3] * 2, jnp.float32))
    tw = jnp.zeros((1, 3), jnp.float32)
    wl = bigmap.make_workload(N, 8, M, key)
    for t in range(8):
        key, k1, k2 = jax.random.split(key, 3)
        ids = jax.random.randint(k1, (M,), 0, N)
        lm = wl.landmarks[ids]
        zs = jnp.stack([jnp.hypot(lm[:, 0], lm[:, 1]),
                        jnp.arctan2(lm[:, 1], lm[:, 0])], axis=-1)
        zs = zs + 0.03 * jax.random.normal(k2, zs.shape)
        zs = zs[None].astype(jnp.float32)
        valid = jnp.ones((1, M), bool)
        st_a = xla(st_a, tw, zs, valid, Q, R)
        st_b = kern(st_b, tw, zs, valid, Q, R)
    np.testing.assert_array_equal(np.asarray(st_a.n_seen),
                                  np.asarray(st_b.n_seen))
    np.testing.assert_array_equal(np.asarray(st_a.seen),
                                  np.asarray(st_b.seen))


def test_seq_scan_supported_gates():
    """Routing gate: misaligned N (DMA would run past the plane) and
    VMEM-overflow sizes must both route to the XLA scan. The scoped-vmem
    limit is raised to 64 MB via CompilerParams (r04 — the 16 MB Mosaic
    default is a pipelining-headroom default, not the hardware; the
    unknown kernel at N=16384 needs 16.03 MB), so every
    single-chip-HBM-representable grid routes through the kernel."""
    from shermbot_navigation_tpu.ops.pallas.seq_scan import seq_scan_supported
    assert seq_scan_supported(2048, 8)
    assert seq_scan_supported(16384, 8)
    assert seq_scan_supported(24576, 8)       # 23 MB < the raised limit
    assert not seq_scan_supported(100, 8)     # N % 8 != 0
    assert not seq_scan_supported(2044, 8)    # N % 8 != 0
    assert not seq_scan_supported(131072, 8)  # 119 MB > 64 MB limit


def test_seq_kernel_rejects_multi_shard():
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs >= 2 devices")
    mesh = make_mesh(devs[:2], data=1)
    cfg = EKFConfig(num_landmarks=N)
    with pytest.raises(ValueError, match="seq_kernel"):
        blocked_ekf.make_sharded_deferred_step(cfg, mesh, 1, M,
                                               seq_kernel=True)
