"""Batch SLAM refinement: poses + landmarks via Schur-complement reduction.

The config-5 component (BASELINE.json: "distributed sparse information-filter
/ bundle-adjustment refinement via Schur-complement reduction"): given an
odometry prior trajectory and range-bearing landmark observations, jointly
refine all keyframe poses (T, 3) and landmarks (N, 2) by Gauss-Newton on the
information form::

    [ Hpp  Hpl ] [dp]   [ -bp ]
    [ Hlp  Hll ] [dl] = [ -bl ]

``Hll`` is block-diagonal (2x2 per landmark — landmarks are conditionally
independent given poses), so the landmark block eliminates in closed form:

    S dp = -bp + Hpl Hll^-1 bl          (S = Hpp - Hpl Hll^-1 Hlp)
    dl   = -Hll^-1 (bl + Hlp dp)

``S`` is never materialized: CG consumes ``S v`` as pure gather -> block
product -> scatter-add chains over the observation list. That form is what
shards over the 'map' mesh axis (parallel/schur_dist.py): each shard owns a
landmark block and its observations; pose-space partials combine with one
``psum`` per matvec.

The reference has nothing comparable (its map is 6 landmarks in an EKF);
cite: the EKF measurement model being refined is the same h/H as
slam_library.cpp:150-186.

Fixed shapes: observations are padded, masked by ``weight``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import se2
from ..ops.smallalg import solve3
from .pose_graph import PoseGraph, residuals as pg_residuals

PRECISION = jax.lax.Precision.HIGHEST


class BundleProblem(NamedTuple):
    poses: jnp.ndarray     # (T, 3) current pose estimates [th, x, y]
    landmarks: jnp.ndarray # (N, 2) current landmark estimates
    # odometry chain (relative-pose factors between consecutive keyframes)
    odo_meas: jnp.ndarray  # (T-1, 3) measured relative poses
    odo_info: jnp.ndarray  # (3, 3) information for each odometry factor
    # landmark observations
    obs_t: jnp.ndarray     # (M,) int32 pose index
    obs_j: jnp.ndarray     # (M,) int32 landmark index
    obs_z: jnp.ndarray     # (M, 2) [range, bearing]
    obs_info: jnp.ndarray  # (2, 2) information for each observation
    obs_w: jnp.ndarray     # (M,) 0/1 mask
    anchor_w: jnp.ndarray  # () gauge anchor weight on pose 0


def range_bearing(pose, lm):
    """h(x, l): the EKF measurement model (ref slam_library.cpp:150-160)."""
    dx = lm[0] - pose[1]
    dy = lm[1] - pose[2]
    d = jnp.maximum(dx * dx + dy * dy, 1e-12)
    return jnp.stack([jnp.sqrt(d),
                      se2.normalize_angle(jnp.arctan2(dy, dx) - pose[0])])


def _obs_residual(pose, lm, z):
    r = range_bearing(pose, lm) - z
    return r.at[1].set(se2.normalize_angle(r[1]))


_obs_rj = jax.vmap(
    lambda p, l, z: (
        _obs_residual(p, l, z),
        jax.jacfwd(_obs_residual, argnums=0)(p, l, z),   # (2, 3)
        jax.jacfwd(_obs_residual, argnums=1)(p, l, z),   # (2, 2)
    )
)


def _odo_graph(prob: BundleProblem) -> PoseGraph:
    T = prob.poses.shape[0]
    i = jnp.arange(T - 1, dtype=jnp.int32)
    return PoseGraph(
        poses=prob.poses, edge_i=i, edge_j=i + 1, meas=prob.odo_meas,
        info=jnp.broadcast_to(prob.odo_info, (T - 1, 3, 3)),
        weight=jnp.ones(T - 1, prob.poses.dtype))


def _terms(prob: BundleProblem):
    """All residuals/Jacobians + the landmark-block inverse."""
    g = _odo_graph(prob)
    r_o, Ji, Jj = pg_residuals(g)

    p = prob.poses[prob.obs_t]
    l = prob.landmarks[prob.obs_j]
    r_z, Jp, Jl = _obs_rj(p, l, prob.obs_z)

    w = prob.obs_w[:, None, None]
    OJp = jnp.einsum("ij,ejk->eik", prob.obs_info, Jp,
                     precision=PRECISION) * w
    OJl = jnp.einsum("ij,ejk->eik", prob.obs_info, Jl,
                     precision=PRECISION) * w

    # Hll blocks: sum_e Jl^T O Jl per landmark -> (N, 2, 2)
    N = prob.landmarks.shape[0]
    Hll = jnp.zeros((N, 2, 2), prob.poses.dtype)
    Hll = Hll.at[prob.obs_j].add(
        jnp.einsum("eji,ejk->eik", Jl, OJl, precision=PRECISION))
    # damping keeps never-observed landmarks invertible
    Hll = Hll + 1e-8 * jnp.eye(2, dtype=prob.poses.dtype)
    from .ekf_slam import _inv2x2
    Hll_inv = _inv2x2(Hll)

    return g, (r_o, Ji, Jj), (r_z, Jp, Jl, OJp, OJl), Hll_inv


def _pose_rhs(prob, g, odo_terms, obs_terms):
    """bp (T,3) and bl (N,2)."""
    r_o, Ji, Jj = odo_terms
    r_z, Jp, Jl, OJp, OJl = obs_terms
    T = prob.poses.shape[0]
    N = prob.landmarks.shape[0]

    Or = jnp.einsum("eij,ej->ei", g.info, r_o, precision=PRECISION)
    bp = jnp.zeros((T, 3), prob.poses.dtype)
    bp = bp.at[g.edge_i].add(
        jnp.einsum("eji,ej->ei", Ji, Or, precision=PRECISION))
    bp = bp.at[g.edge_j].add(
        jnp.einsum("eji,ej->ei", Jj, Or, precision=PRECISION))

    Orz = jnp.einsum("ij,ej->ei", prob.obs_info, r_z,
                     precision=PRECISION) * prob.obs_w[:, None]
    bp = bp.at[prob.obs_t].add(
        jnp.einsum("eji,ej->ei", Jp, Orz, precision=PRECISION))
    bl = jnp.zeros((N, 2), prob.poses.dtype)
    bl = bl.at[prob.obs_j].add(
        jnp.einsum("eji,ej->ei", Jl, Orz, precision=PRECISION))
    return bp, bl


def _hpp_v(prob, g, odo_terms, obs_terms, v):
    """(Hpp v): odometry-chain part + observation part + anchor."""
    r_o, Ji, Jj = odo_terms
    r_z, Jp, Jl, OJp, OJl = obs_terms
    out = jnp.zeros_like(v)

    vi = v[g.edge_i]
    vj = v[g.edge_j]
    Jv = (jnp.einsum("eij,ej->ei", Ji, vi, precision=PRECISION)
          + jnp.einsum("eij,ej->ei", Jj, vj, precision=PRECISION))
    OJv = jnp.einsum("eij,ej->ei", g.info, Jv, precision=PRECISION)
    out = out.at[g.edge_i].add(
        jnp.einsum("eji,ej->ei", Ji, OJv, precision=PRECISION))
    out = out.at[g.edge_j].add(
        jnp.einsum("eji,ej->ei", Jj, OJv, precision=PRECISION))

    Jpv = jnp.einsum("eij,ej->ei", Jp, v[prob.obs_t], precision=PRECISION)
    OJpv = jnp.einsum("ij,ej->ei", prob.obs_info, Jpv,
                      precision=PRECISION) * prob.obs_w[:, None]
    out = out.at[prob.obs_t].add(
        jnp.einsum("eji,ej->ei", Jp, OJpv, precision=PRECISION))

    out = out.at[0].add(prob.anchor_w * v[0])
    return out


def _hlp_v(prob, obs_terms, v):
    """(Hlp v): pose vector (T,3) -> landmark vector (N,2)."""
    r_z, Jp, Jl, OJp, OJl = obs_terms
    N = prob.landmarks.shape[0]
    Jpv = jnp.einsum("eij,ej->ei", Jp, v[prob.obs_t], precision=PRECISION)
    OJpv = jnp.einsum("ij,ej->ei", prob.obs_info, Jpv,
                      precision=PRECISION) * prob.obs_w[:, None]
    out = jnp.zeros((N, 2), v.dtype)
    return out.at[prob.obs_j].add(
        jnp.einsum("eji,ej->ei", Jl, OJpv, precision=PRECISION))


def _hpl_u(prob, obs_terms, u):
    """(Hpl u): landmark vector (N,2) -> pose vector (T,3)."""
    r_z, Jp, Jl, OJp, OJl = obs_terms
    T = prob.poses.shape[0]
    Jlu = jnp.einsum("eij,ej->ei", Jl, u[prob.obs_j], precision=PRECISION)
    OJlu = jnp.einsum("ij,ej->ei", prob.obs_info, Jlu,
                      precision=PRECISION) * prob.obs_w[:, None]
    out = jnp.zeros((T, 3), u.dtype)
    return out.at[prob.obs_t].add(
        jnp.einsum("eji,ej->ei", Jp, OJlu, precision=PRECISION))


def _cg(matvec, b, iters, precond=None):
    Minv = precond if precond is not None else (lambda r: r)
    x = jnp.zeros_like(b)
    r = b
    z = Minv(r)
    p = z
    rz = jnp.sum(r * z)

    def body(carry, _):
        x, r, p, rz = carry
        Ap = matvec(p)
        alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        z = Minv(r)
        rz_new = jnp.sum(r * z)
        p = z + (rz_new / jnp.maximum(rz, 1e-30)) * p
        return (x, r, p, rz_new), None

    (x, _, _, _), _ = jax.lax.scan(body, (x, r, p, rz), None, length=iters)
    return x


def _hpp_diag_blocks(prob, g, odo_terms, obs_terms, damping):
    """(T, 3, 3) diagonal blocks of Hpp for Jacobi preconditioning."""
    r_o, Ji, Jj = odo_terms
    r_z, Jp, Jl, OJp, OJl = obs_terms
    T = prob.poses.shape[0]
    dtype = prob.poses.dtype
    Oi = jnp.einsum("eij,ejk->eik", g.info, Ji, precision=PRECISION)
    Oj = jnp.einsum("eij,ejk->eik", g.info, Jj, precision=PRECISION)
    D = jnp.zeros((T, 3, 3), dtype)
    D = D.at[g.edge_i].add(
        jnp.einsum("eji,ejk->eik", Ji, Oi, precision=PRECISION))
    D = D.at[g.edge_j].add(
        jnp.einsum("eji,ejk->eik", Jj, Oj, precision=PRECISION))
    D = D.at[prob.obs_t].add(
        jnp.einsum("eji,ejk->eik", Jp, OJp, precision=PRECISION))
    D = D.at[0].add(prob.anchor_w * jnp.eye(3, dtype=dtype))
    return D + damping * jnp.eye(3, dtype=dtype)


def gauss_newton_step(prob: BundleProblem, damping: float = 1e-6,
                      cg_iters: int = 64) -> BundleProblem:
    """One GN step with Schur elimination of the landmark block."""
    g, odo_terms, obs_terms, Hll_inv = _terms(prob)
    bp, bl = _pose_rhs(prob, g, odo_terms, obs_terms)

    def Sv(v):
        u = _hlp_v(prob, obs_terms, v)                       # Hlp v
        u = jnp.einsum("nij,nj->ni", Hll_inv, u,
                       precision=PRECISION)                  # Hll^-1 Hlp v
        return (_hpp_v(prob, g, odo_terms, obs_terms, v)
                - _hpl_u(prob, obs_terms, u) + damping * v)

    rhs = -bp + _hpl_u(
        prob, obs_terms,
        jnp.einsum("nij,nj->ni", Hll_inv, bl, precision=PRECISION))
    D = _hpp_diag_blocks(prob, g, odo_terms, obs_terms, damping)
    dp = _cg(Sv, rhs, cg_iters, precond=lambda r: solve3(D, r))

    dl = -jnp.einsum(
        "nij,nj->ni", Hll_inv,
        bl + _hlp_v(prob, obs_terms, dp), precision=PRECISION)

    poses = prob.poses + dp
    poses = poses.at[:, 0].set(se2.normalize_angle(poses[:, 0]))
    # exact gauge fix (see pose_graph.gauge_project): kill the near-free
    # global-rotation mode instead of letting it drift against the anchor
    from .pose_graph import gauge_project
    poses, landmarks = gauge_project(poses, prob.poses[0],
                                     prob.landmarks + dl)
    return prob._replace(poses=poses, landmarks=landmarks)


def optimize(prob: BundleProblem, iters: int = 5, **kw) -> BundleProblem:
    def body(p, _):
        return gauss_newton_step(p, **kw), None

    prob, _ = jax.lax.scan(body, prob, None, length=iters)
    return prob


def total_cost(prob: BundleProblem):
    g, (r_o, _, _), (r_z, _, _, _, _), _ = _terms(prob)
    c_o = jnp.sum(jnp.einsum("ei,ij,ej->e", r_o, prob.odo_info, r_o,
                             precision=PRECISION))
    c_z = jnp.sum(prob.obs_w * jnp.einsum(
        "ei,ij,ej->e", r_z, prob.obs_info, r_z, precision=PRECISION))
    return c_o + c_z
