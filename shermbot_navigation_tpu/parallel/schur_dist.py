"""Distributed Schur-complement refinement (BASELINE config 5).

Shards the bundle problem of ``models.schur`` over the 'map' mesh axis:
landmarks live on their owner shard together with every observation that
references them (observations are pre-partitioned by landmark id, so the
landmark-side products ``Hll``, ``Hlp v``, ``Hpl u`` are fully local).
Pose-space vectors (T, 3) are replicated; each CG matvec combines the
shards' pose-space partials with ONE ``psum`` — the communication pattern
is a single all-reduce of (T, 3) floats per iteration, riding ICI.

The odometry-chain part of ``Hpp`` is computed redundantly on every shard
(it is O(T) — negligible next to the observation terms) so no additional
collective is needed.

Partitioning contract: observation arrays are ordered so shard s owns the
slice ``[s * M_local, (s+1) * M_local)`` and every observation in that slice
references a landmark in ``[s * N_local, (s+1) * N_local)``. Use
:func:`partition_problem` to reorder/pad an arbitrary problem into this
layout (host-side, once).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..models import schur
from ..models.ekf_slam import _inv2x2
from ..ops.smallalg import solve3
from ..models.pose_graph import (PoseGraph, gauge_project,
                                 residuals as pg_residuals)
from ..ops import se2

PRECISION = jax.lax.Precision.HIGHEST


def partition_problem(prob: schur.BundleProblem, n_shards: int
                      ) -> schur.BundleProblem:
    """Reorder observations by landmark owner and pad each shard's slice to
    a common length (host-side numpy; run once before jit)."""
    N = prob.landmarks.shape[0]
    if N % n_shards:
        raise ValueError(f"N={N} not divisible by {n_shards}")
    n_local = N // n_shards
    obs_j = np.asarray(prob.obs_j)
    obs_w = np.asarray(prob.obs_w)
    owner = obs_j // n_local
    counts = [int(((owner == s) & (obs_w > 0)).sum())
              for s in range(n_shards)]
    m_local = max(counts) if counts else 1
    m_local = max(m_local, 1)

    idx_t = np.zeros((n_shards, m_local), np.int32)
    idx_j = np.full((n_shards, m_local), 0, np.int32)
    z = np.zeros((n_shards, m_local, 2), np.asarray(prob.obs_z).dtype)
    w = np.zeros((n_shards, m_local), np.asarray(prob.obs_w).dtype)
    for s in range(n_shards):
        sel = np.where((owner == s) & (obs_w > 0))[0]
        k = len(sel)
        idx_t[s, :k] = np.asarray(prob.obs_t)[sel]
        idx_j[s, :k] = obs_j[sel]
        # padded slots must reference a landmark the shard owns
        idx_j[s, k:] = s * n_local
        z[s, :k] = np.asarray(prob.obs_z)[sel]
        w[s, :k] = 1.0
    return prob._replace(
        obs_t=jnp.asarray(idx_t.reshape(-1)),
        obs_j=jnp.asarray(idx_j.reshape(-1)),
        obs_z=jnp.asarray(z.reshape(-1, 2)),
        obs_w=jnp.asarray(w.reshape(-1)),
    )


def make_sharded_gn(mesh: Mesh, T: int, N: int, M: int,
                    cg_iters: int = 64, damping: float = 1e-6):
    """Build the jitted sharded Gauss-Newton step.

    Array placement: poses/odometry replicated; ``landmarks`` (N, 2) and the
    observation arrays (M,) sharded over 'map'. Returns
    ``step(prob) -> prob``.
    """
    n_map = mesh.shape["map"]
    if N % n_map or M % n_map:
        raise ValueError("N and M must divide the map axis")

    in_specs = schur.BundleProblem(
        poses=P(), landmarks=P("map", None),
        odo_meas=P(), odo_info=P(),
        obs_t=P("map"), obs_j=P("map"), obs_z=P("map", None),
        obs_info=P(), obs_w=P("map"), anchor_w=P(),
    )

    def shard_fn(prob: schur.BundleProblem):
        # local views: landmarks (Nl, 2); obs (Ml,) referencing GLOBAL ids
        shard = jax.lax.axis_index("map")
        n_local = prob.landmarks.shape[0]
        off = shard * n_local
        dtype = prob.poses.dtype

        # odometry graph (replicated, cheap)
        Tn = prob.poses.shape[0]
        ii = jnp.arange(Tn - 1, dtype=jnp.int32)
        g = PoseGraph(
            poses=prob.poses, edge_i=ii, edge_j=ii + 1, meas=prob.odo_meas,
            info=jnp.broadcast_to(prob.odo_info, (Tn - 1, 3, 3)),
            weight=jnp.ones(Tn - 1, dtype))
        r_o, Ji, Jj = pg_residuals(g)

        # local observation residuals/Jacobians
        j_loc = prob.obs_j - off
        p = prob.poses[prob.obs_t]
        l = prob.landmarks[j_loc]
        r_z, Jp, Jl = schur._obs_rj(p, l, prob.obs_z)
        wv = prob.obs_w[:, None]

        # local Hll blocks + inverse
        OJl = jnp.einsum("ij,ejk->eik", prob.obs_info, Jl,
                         precision=PRECISION) * prob.obs_w[:, None, None]
        Hll = jnp.zeros((n_local, 2, 2), dtype)
        Hll = Hll.at[j_loc].add(
            jnp.einsum("eji,ejk->eik", Jl, OJl, precision=PRECISION))
        Hll = Hll + 1e-8 * jnp.eye(2, dtype=dtype)
        Hll_inv = _inv2x2(Hll)

        # rhs
        Or = jnp.einsum("eij,ej->ei", g.info, r_o, precision=PRECISION)
        bp_odo = jnp.zeros((Tn, 3), dtype)
        bp_odo = bp_odo.at[g.edge_i].add(
            jnp.einsum("eji,ej->ei", Ji, Or, precision=PRECISION))
        bp_odo = bp_odo.at[g.edge_j].add(
            jnp.einsum("eji,ej->ei", Jj, Or, precision=PRECISION))

        Orz = jnp.einsum("ij,ej->ei", prob.obs_info, r_z,
                         precision=PRECISION) * wv
        bp_obs_local = jnp.zeros((Tn, 3), dtype).at[prob.obs_t].add(
            jnp.einsum("eji,ej->ei", Jp, Orz, precision=PRECISION))
        bl_local = jnp.zeros((n_local, 2), dtype).at[j_loc].add(
            jnp.einsum("eji,ej->ei", Jl, Orz, precision=PRECISION))

        def hlp_v(v):
            Jpv = jnp.einsum("eij,ej->ei", Jp, v[prob.obs_t],
                             precision=PRECISION)
            OJpv = jnp.einsum("ij,ej->ei", prob.obs_info, Jpv,
                              precision=PRECISION) * wv
            return jnp.zeros((n_local, 2), dtype).at[j_loc].add(
                jnp.einsum("eji,ej->ei", Jl, OJpv, precision=PRECISION))

        def hpl_u_local(u):
            Jlu = jnp.einsum("eij,ej->ei", Jl, u[j_loc],
                             precision=PRECISION)
            OJlu = jnp.einsum("ij,ej->ei", prob.obs_info, Jlu,
                              precision=PRECISION) * wv
            return jnp.zeros((Tn, 3), dtype).at[prob.obs_t].add(
                jnp.einsum("eji,ej->ei", Jp, OJlu, precision=PRECISION))

        def hpp_obs_v(v):
            Jpv = jnp.einsum("eij,ej->ei", Jp, v[prob.obs_t],
                             precision=PRECISION)
            OJpv = jnp.einsum("ij,ej->ei", prob.obs_info, Jpv,
                              precision=PRECISION) * wv
            return jnp.zeros((Tn, 3), dtype).at[prob.obs_t].add(
                jnp.einsum("eji,ej->ei", Jp, OJpv, precision=PRECISION))

        def hpp_odo_v(v):
            vi = v[g.edge_i]
            vj = v[g.edge_j]
            Jv = (jnp.einsum("eij,ej->ei", Ji, vi, precision=PRECISION)
                  + jnp.einsum("eij,ej->ei", Jj, vj, precision=PRECISION))
            OJv = jnp.einsum("eij,ej->ei", g.info, Jv, precision=PRECISION)
            out = jnp.zeros_like(v)
            out = out.at[g.edge_i].add(
                jnp.einsum("eji,ej->ei", Ji, OJv, precision=PRECISION))
            out = out.at[g.edge_j].add(
                jnp.einsum("eji,ej->ei", Jj, OJv, precision=PRECISION))
            return out.at[0].add(prob.anchor_w * v[0])

        nmap = jax.lax.psum(1, "map") * 0 + jax.lax.axis_size("map")

        def Sv(v):
            # local contributions, then one psum over 'map'
            u = jnp.einsum("nij,nj->ni", Hll_inv, hlp_v(v),
                           precision=PRECISION)
            local = hpp_obs_v(v) - hpl_u_local(u)
            total = jax.lax.psum(local, "map")
            # odo part + damping computed redundantly (identical on shards)
            return total + hpp_odo_v(v) + damping * v

        bp = bp_odo + jax.lax.psum(bp_obs_local, "map")
        rhs = -bp + jax.lax.psum(
            hpl_u_local(jnp.einsum("nij,nj->ni", Hll_inv, bl_local,
                                   precision=PRECISION)), "map")

        # block-Jacobi preconditioner: 3x3 diagonal blocks of Hpp
        # (odometry-chain part + local observation part psummed)
        Dodo = jnp.zeros((Tn, 3, 3), dtype)
        Oi = jnp.einsum("eij,ejk->eik", g.info, Ji, precision=PRECISION)
        Oj = jnp.einsum("eij,ejk->eik", g.info, Jj, precision=PRECISION)
        Dodo = Dodo.at[g.edge_i].add(
            jnp.einsum("eji,ejk->eik", Ji, Oi, precision=PRECISION))
        Dodo = Dodo.at[g.edge_j].add(
            jnp.einsum("eji,ejk->eik", Jj, Oj, precision=PRECISION))
        Dodo = Dodo.at[0].add(prob.anchor_w * jnp.eye(3, dtype=dtype))
        OJp = jnp.einsum("ij,ejk->eik", prob.obs_info, Jp,
                         precision=PRECISION) * prob.obs_w[:, None, None]
        Dobs = jnp.zeros((Tn, 3, 3), dtype).at[prob.obs_t].add(
            jnp.einsum("eji,ejk->eik", Jp, OJp, precision=PRECISION))
        D = Dodo + jax.lax.psum(Dobs, "map") + damping * jnp.eye(
            3, dtype=dtype)

        # preconditioned CG on the replicated pose space
        def cg(matvec, b):
            x = jnp.zeros_like(b)
            r = b
            z = solve3(D, r)
            p = z
            rz = jnp.sum(r * z)

            def body(carry, _):
                x, r, p, rz = carry
                Ap = matvec(p)
                alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-30)
                x = x + alpha * p
                r = r - alpha * Ap
                z = solve3(D, r)
                rz_new = jnp.sum(r * z)
                p = z + (rz_new / jnp.maximum(rz, 1e-30)) * p
                return (x, r, p, rz_new), None

            (x, _, _, _), _ = jax.lax.scan(body, (x, r, p, rz), None,
                                           length=cg_iters)
            return x

        dp = cg(Sv, rhs)
        dl_local = -jnp.einsum(
            "nij,nj->ni", Hll_inv, bl_local + hlp_v(dp),
            precision=PRECISION)

        poses = prob.poses + dp
        poses = poses.at[:, 0].set(se2.normalize_angle(poses[:, 0]))
        # exact gauge fix (see models.pose_graph.gauge_project): G is
        # computed from replicated pose data, so every shard applies the
        # same rigid motion to its landmark block.
        poses, landmarks = gauge_project(
            poses, prob.poses[0], prob.landmarks + dl_local)
        return prob._replace(poses=poses, landmarks=landmarks)

    fn = shard_map(shard_fn, mesh=mesh, in_specs=(in_specs,),
                   out_specs=in_specs, check_vma=False)
    return jax.jit(fn)
