"""Large synthetic-map workload (BASELINE config 4): thousands of landmarks,
blocked covariance, sharded over the ('data', 'map') mesh.

The workload: B robots random-walk over a big landmark field; every tick
each robot observes ``M`` landmarks (a precomputed visit schedule sweeping
the whole map, known association — the scheme BASELINE.json's config 4
measures) and the blocked EKF performs predict + M sequential updates with
the map dimension sharded over 'map' and the batch over 'data'.

Ground truth is generated analytically (no tube-world needed at this scale);
measurement generation happens inside the same jitted step so nothing
round-trips the host.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding

from ..models.ekf_slam import EKFConfig, cartesian2polar
from ..ops import se2
from . import blocked_ekf
from .mesh import make_mesh


class BigMapWorkload(NamedTuple):
    landmarks: jnp.ndarray   # (N, 2) true positions
    cmd: jnp.ndarray         # (T, 3) command twists
    schedule: jnp.ndarray    # (T, M) landmark ids observed per tick


def make_workload(N: int, T: int, M: int, key, spacing: float = 2.0,
                  dtype=jnp.float32) -> BigMapWorkload:
    """Grid of N landmarks; a looping robot; a schedule that sweeps ids so
    every landmark is initialized and revisited."""
    import math
    side = math.ceil(math.sqrt(N))
    ii = jnp.arange(N)
    lms = jnp.stack([(ii % side - side / 2) * spacing,
                     (ii // side - side / 2) * spacing], axis=-1).astype(dtype)
    w = 2 * jnp.pi / max(T, 1)
    cmd = jnp.broadcast_to(
        jnp.array([w, 0.1, 0.0], dtype), (T, 3))
    # sweep: tick t observes ids [t*M .. t*M+M) mod N, then revisits
    t_idx = jnp.arange(T)[:, None]
    schedule = (t_idx * M + jnp.arange(M)[None, :]) % N
    return BigMapWorkload(landmarks=lms, cmd=cmd,
                          schedule=schedule.astype(jnp.int32))


def _true_pose(cmd, t, dtype):
    """Closed-form pose after t constant-twist ticks (arc)."""
    w, v = cmd[0, 0], cmd[0, 1]
    th = w * t
    r = v / w
    x = r * jnp.sin(th)
    y = r * (1.0 - jnp.cos(th))
    return jnp.stack([th, x, y]).astype(dtype)


def _resolve_grid_kernel(grid_kernel, cfg: EKFConfig, mesh: Mesh,
                         dtype) -> bool:
    """``None`` -> auto: the fused Pallas grid pass on TPU when the plane
    shapes are lane-aligned and the mesh is single-shard. MEASURED (r03
    chip session, bench_config4_matrix, comp-plane grid state): with the
    measurement-scan kernel the grid pass dominates the tick and the
    2-pass-floor kernel wins end-to-end — N=8192 known 117.6 vs 65.6
    ticks/s (1.79x, 252 GB/s physical), N=2048 known 1531 vs 1157 (1.32x).
    (The r02-era demotion measured the FLAT grid state, where feeding the
    kernel forced a 64x tile-padded relayout copy — 27 vs 121 ticks/s,
    OOM at N=8192; the plane layout makes that relayout impossible.)
    Multi-shard meshes default to the XLA schedule (kernel-under-shard_map
    is dryrun-verified in interpret mode but not hardware-measured here);
    ``grid_kernel=True`` forces it."""
    if grid_kernel is not None:
        return bool(grid_kernel)
    if dtype != jnp.float32:
        return False
    if jax.devices()[0].platform in ("cpu",):
        return False
    if mesh.shape["map"] != 1:
        return False
    from ..ops.pallas.grid_update import grid_shapes_supported
    N = cfg.num_landmarks
    return grid_shapes_supported(N // mesh.shape["map"], N)


def _resolve_seq_kernel(seq_kernel, cfg_N: int, M: int, mesh: Mesh,
                        batch: int, dtype) -> bool:
    """``None`` -> auto: the fused Pallas measurement-scan kernel
    (ops/pallas/seq_scan.py) on a real TPU backend when its routing
    constraints hold — single 'map' shard, one batch element per 'data'
    shard, f32. The XLA scan lowering is launch-bound (~280 ops per
    measurement, benchmarks/dump_deferred_hlo.py); the kernel runs the
    whole scan in VMEM. Multi-shard meshes keep the XLA scan — its psums
    and once-per-tick all_gathers are the multi-chip comm design."""
    if seq_kernel is not None:
        return bool(seq_kernel)
    if mesh.shape["map"] != 1 or batch != mesh.shape["data"]:
        return False
    if dtype != jnp.float32:
        return False
    # MEASURED (r03_seq_kernel_ab.json, on-chip A/B at N=2048): known
    # 8.90 -> 0.606 ms/tick (14.7x), unknown 9.11 -> 0.689 (13.2x);
    # device-side parity over every state field ~1e-6 after 16 ticks.
    # The XLA scan lowering is launch-bound (~280 ops/measurement); the
    # kernel runs the whole scan in VMEM, gated by seq_scan_supported
    # (r04: the pallas_call raises Mosaic's scoped-vmem limit to 64 MB,
    # so every grid that fits one chip's HBM routes through the kernel;
    # only misaligned N — not a multiple of 8, DMA alignment — falls
    # back to the XLA scan on one shard).
    from ..ops.pallas.seq_scan import seq_scan_supported
    return (jax.devices()[0].platform not in ("cpu",)
            and seq_scan_supported(cfg_N, M))


def make_runner(cfg: EKFConfig, mesh: Mesh, batch: int, M: int,
                deferred: bool = True, grid_kernel: bool | None = None,
                dtype=jnp.float32, donate: bool = False,
                meas_unroll: bool = False,
                seq_kernel: bool | None = None,
                seq_interpret: bool = False):
    """Build ``run(state, workload, Q, R, t0, ticks) -> state`` jitted over
    the mesh: generates measurements on device and applies the sharded
    blocked step ``ticks`` times via lax.scan.

    ``deferred=True`` (default) uses the rank-2M grid update — one full
    landmark-grid pass per tick instead of per measurement, identical
    semantics (test_blocked_ekf::test_deferred_matches_sequential).
    ``grid_kernel=None`` auto-enables the fused Pallas grid pass on TPU.
    ``donate=True`` donates the input state's buffers to the call — the
    out-Sigma reuses the in-Sigma allocation instead of doubling peak HBM
    (1.07 GB apiece at N=8192); the input state is dead after the call, so
    only linear ``state = run(state, ...)`` call chains may enable it."""
    if deferred:
        step = blocked_ekf.make_sharded_deferred_step(
            cfg, mesh, batch, M,
            grid_kernel=_resolve_grid_kernel(grid_kernel, cfg, mesh, dtype),
            meas_unroll=meas_unroll,
            seq_kernel=_resolve_seq_kernel(seq_kernel, cfg.num_landmarks,
                                           M, mesh, batch, dtype),
            seq_interpret=seq_interpret)
    else:
        step = blocked_ekf.make_sharded_step(cfg, mesh, batch, M)

    @functools.partial(jax.jit, static_argnames=("ticks",),
                       donate_argnums=(0,) if donate else ())
    def run(state, wl: BigMapWorkload, Q, R, t0, ticks: int):
        dtype = state.mean_r.dtype

        def body(carry, t):
            st = carry
            # the EKF predicts from pose(t) to pose(t+1) before updating, so
            # this tick's measurements are taken at pose(t+1)
            pose = _true_pose(wl.cmd, t.astype(dtype) + 1.0, dtype)
            ids = wl.schedule[t % wl.schedule.shape[0]]       # (M,)
            lm = wl.landmarks[ids]                            # (M, 2)
            dx = lm[:, 0] - pose[1]
            dy = lm[:, 1] - pose[2]
            zs = cartesian2polar(dx, dy)
            zs = zs.at[:, 1].set(se2.normalize_angle(zs[:, 1] - pose[0]))
            zsb = jnp.broadcast_to(zs, (batch, M, 2))
            idsb = jnp.broadcast_to(ids, (batch, M))
            valid = jnp.ones((batch, M), bool)
            tw = jnp.broadcast_to(wl.cmd[t % wl.cmd.shape[0]], (batch, 3))
            st = step(st, tw, zsb, valid, idsb, Q, R)
            return st, None

        state, _ = jax.lax.scan(body, state, t0 + jnp.arange(ticks))
        return state

    return run


def make_unknown_runner(cfg: EKFConfig, mesh: Mesh, batch: int, M: int,
                        deferred: bool = True,
                        grid_kernel: bool | None = None, dtype=jnp.float32,
                        donate: bool = False, meas_unroll: bool = False,
                        seq_kernel: bool | None = None,
                        seq_interpret: bool = False):
    """Like :func:`make_runner` but with UNKNOWN association: every
    measurement is gated by the blockwise-distributed Mahalanobis first-hit
    scan instead of carrying its landmark id — the config-4 workload at the
    reference's association semantics. ``deferred=True`` uses the rank-2M
    one-grid-pass-per-tick step (gate decisions identical in exact
    arithmetic; association scores against the carried diagonal strip).
    ``grid_kernel=None`` auto-enables the fused Pallas grid pass on TPU."""
    if deferred:
        step = blocked_ekf.make_sharded_deferred_unknown_step(
            cfg, mesh, batch, M,
            grid_kernel=_resolve_grid_kernel(grid_kernel, cfg, mesh, dtype),
            meas_unroll=meas_unroll,
            seq_kernel=_resolve_seq_kernel(seq_kernel, cfg.num_landmarks,
                                           M, mesh, batch, dtype),
            seq_interpret=seq_interpret)
    else:
        step = blocked_ekf.make_sharded_unknown_step(cfg, mesh, batch, M)

    @functools.partial(jax.jit, static_argnames=("ticks",),
                       donate_argnums=(0,) if donate else ())
    def run(state, wl: BigMapWorkload, Q, R, t0, ticks: int):
        dtype = state.mean_r.dtype

        def body(carry, t):
            st = carry
            pose = _true_pose(wl.cmd, t.astype(dtype) + 1.0, dtype)
            ids = wl.schedule[t % wl.schedule.shape[0]]
            lm = wl.landmarks[ids]
            dx = lm[:, 0] - pose[1]
            dy = lm[:, 1] - pose[2]
            zs = cartesian2polar(dx, dy)
            zs = zs.at[:, 1].set(se2.normalize_angle(zs[:, 1] - pose[0]))
            zsb = jnp.broadcast_to(zs, (batch, M, 2))
            valid = jnp.ones((batch, M), bool)
            tw = jnp.broadcast_to(wl.cmd[t % wl.cmd.shape[0]], (batch, 3))
            st = step(st, tw, zsb, valid, Q, R)
            return st, None

        state, _ = jax.lax.scan(body, state, t0 + jnp.arange(ticks))
        return state

    return run


def run_bigmap(N: int = 2048, T: int = 32, M: int = 8, batch: int = 1,
               mesh: Mesh | None = None, dtype=jnp.float32):
    """End-to-end config-4 run; returns (final BlockedState, workload)."""
    if mesh is None:
        mesh = make_mesh(jax.devices()[:1], data=1)
    cfg = EKFConfig(num_landmarks=N)
    wl = make_workload(N, T, M, jax.random.PRNGKey(0), dtype=dtype)
    runner = make_runner(cfg, mesh, batch, M, donate=True)
    state = blocked_ekf.init(cfg, batch, dtype=dtype)
    specs = blocked_ekf.state_sharding(mesh)
    state = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs)
    Q = jnp.diag(jnp.array([1e-4, 1e-4, 1e-4], dtype))
    R = jnp.diag(jnp.array([1e-3, 1e-3], dtype))
    state = runner(state, wl, Q, R, jnp.int32(0), T)
    return state, wl
