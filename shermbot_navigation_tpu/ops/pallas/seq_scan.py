"""The deferred tick's ENTIRE per-measurement scan as ONE Pallas kernel.

Why: the XLA lowering of the measurement scan (parallel/blocked_ekf.py,
`_make_sharded_deferred`) compiles to ~280 launched ops per scan iteration
— strip math on a few hundred KB spread over hundreds of tiny kernels —
so the tick is LAUNCH-BOUND at ~1 ms/measurement (r03 strip probe +
`benchmarks/dump_deferred_hlo.py`; a pure layout rework measured neutral
because launch count, not bytes, is the bottleneck). The logical work per
measurement is O(N) vector ops on component strips plus one 16N-byte grid
column read: a single kernel holding every strip in VMEM does the whole
M-measurement loop with zero launch overhead, fetching each needed grid
column from HBM with one 32 KB async DMA.

Semantics: bit-for-bit the component-layout scan body of
`_make_sharded_deferred` at map=1 (the psums there are identity on one
shard) — the same closed-form scalar algebra, the same op-history
buffers, the same column reconstruction replay. Reference analog of the
sequential update loop: /root/reference/nuslam/src/slam.cpp:116-170 (the
per-measurement EKF loop); the deferral algebra itself has no reference
analog.

Routing: single shard ('map'=1) and single local batch element only —
the multi-shard path keeps the XLA scan (its owner-broadcast psums and
once-per-tick all_gathers ARE the multi-chip design, bench_scaling.py).
`interpret=True` runs on CPU for tests (the column fetch reads the ref
directly instead of issuing a TPU DMA).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT_MAX = jnp.iinfo(jnp.int32).max

# Mosaic's DEFAULT scoped-vmem limit is 16 MB — a compiler default that
# guards pipelining headroom, not the hardware (v5e has 128 MB VMEM per
# core). This kernel is a single-invocation whole-problem kernel with no
# pipeline, so we raise the limit: at N=16384/M=8 the known variant
# measures 15.5 MB and the unknown variant 16.03 MB — 28 KB over the
# default (r04: the known row ran at 80% of the 2-pass floor while
# unknown fell back to the 12%-of-floor XLA scan for want of those KB).
_VMEM_LIMIT = 64 * 1024 * 1024

# atan(t)/t as a degree-9 polynomial in t^2 over [0, 1] (Chebyshev-node
# lstsq fit; max abs error 2.1e-9 < f32 ulp of pi). Mosaic's TC lowering
# has no atan2 primitive, so the kernel builds it from mul/add/select.
_ATAN_C = (0.9999999990537065, -0.3333329671515482, 0.19998542266985928,
           -0.14264389793838728, 0.10953449852559692, -0.08407879226728915,
           0.05804045200157317, -0.03126450656077119, 0.010962443145423287,
           -0.001804490181199415)
_PI = 3.14159265358979323846
_HALF_PI = _PI / 2.0


def _atan2(y, x):
    """atan2 from supported Mosaic primitives (poly atan + quadrant fixup).

    Matches jnp.arctan2 to ~2e-9 absolute; the interpret path uses the
    same polynomial so CPU tests validate the exact kernel math.
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    mn = jnp.minimum(ax, ay)
    t = mn / jnp.maximum(mx, jnp.asarray(1e-30, mn.dtype))
    t2 = t * t
    p = jnp.asarray(_ATAN_C[-1], t.dtype)
    for c in _ATAN_C[-2::-1]:
        p = p * t2 + c
    a = t * p
    a = jnp.where(ay > ax, _HALF_PI - a, a)
    a = jnp.where(x < 0, _PI - a, a)
    return jnp.where(y < 0, -a, a)


def _norm_angle(rad):
    """ops/se2.normalize_angle (atan2(sin, cos)) with the in-kernel atan2."""
    return _atan2(jnp.sin(rad), jnp.cos(rad))


def _extract(lane, vec, g):
    """vec (1, N) at lane g -> scalar (masked-sum: exact, no gather)."""
    return jnp.sum(jnp.where(lane == g, vec, jnp.zeros_like(vec)))


def _scatter(lane, vec, g, val):
    """vec (1, N) with lane g <- scalar val."""
    return jnp.where(lane == g, jnp.full_like(vec, val), vec)


def _inv2x2_s(p00, p01, p10, p11):
    det = p00 * p11 - p01 * p10
    return p11 / det, -p01 / det, -p10 / det, p00 / det


def seq_scan_supported(N: int, M: int) -> bool:
    """Routing gate for the fused scan kernel.

    (a) Alignment: fetch_col DMAs the 8-row block containing g with
    ``pl.ds(g8, 8)``; if N % 8 != 0 and g lands in a trailing partial
    block that slice runs past the plane, which is undefined on hardware
    (interpret-mode tests bypass the DMA, so only this gate protects it).
    Production map sizes are powers of two, so nothing real is excluded.

    (b) VMEM: the kernel holds the op buffers (3 x 4M rows), the state
    strips (~26 rows in+out), and the 8-row column scratch in VMEM.
    The pallas_call raises Mosaic's scoped-vmem limit to _VMEM_LIMIT
    (the 16 MB default is pipelining headroom, not hardware — r04), so
    every grid a single chip's HBM can hold routes through the kernel
    (N=16384/M=8: known 15.5 MB, unknown 16.03 MB measured). Mosaic's
    own overhead on top of the estimate measured <= 8%."""
    if N % 8 != 0:
        return False
    rows = 3 * 4 * M * 2 + 26 + 8         # buffers (in+out), strips, colbuf
    est = rows * N * 4
    return est * 1.05 < _VMEM_LIMIT


def _make_kernel(M: int, N: int, known: bool, match_gate: float,
                 new_gate: float, wrap_innovation: bool, symmetrize: bool,
                 interpret: bool):
    f32 = jnp.float32

    def kernel(mean_r_ref, cov_rr_ref, nseen_ref, zs_ref, valid_ref,
               ids_ref, R_ref,
               mm2_ref, rm6_ref, diag4_ref, seen_ref, mm0_ref,
               mean_r_o, cov_rr_o, nseen_o, gb_o, kind_o,
               mm2_o, rm6_o, diag4_o, seen_o, Kb_o, HSb_o, CRb_o,
               colbuf, sem):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)

        # ---- load state: smalls as scalars, strips as (1, N) rows ----
        th = mean_r_ref[0, 0]
        x = mean_r_ref[0, 1]
        y = mean_r_ref[0, 2]
        crr = [[cov_rr_ref[i, k] for k in range(3)] for i in range(3)]
        R = [[R_ref[0, 0], R_ref[0, 1]], [R_ref[1, 0], R_ref[1, 1]]]
        n_seen = nseen_ref[0, 0]
        mm = [mm2_ref[p:p + 1, :] for p in range(2)]
        rm = [rm6_ref[c:c + 1, :] for c in range(6)]
        dg = [diag4_ref[c:c + 1, :] for c in range(4)]
        seen = seen_ref[0:1, :]                    # f32 0/1 mask
        stopped = jnp.bool_(False)

        # per-op scalar history (python lists — the M loop is static)
        kinds = []
        gs = []

        def fetch_col(g):
            """Grid column g as 4 comp rows (1, N).

            The grid arrives as comp planes (4, N, N) in HBM; column g of
            comp (p, q) equals ROW g of the symmetric plane (q, p) — four
            contiguous row-block DMAs, no transpose anywhere. (Sigma is
            symmetric by construction here: init writes mirror one cross
            strip and the rank-2 term is K psi^-1 K^T-shaped; only psi's
            ~1-ulp f32 asymmetry breaks it, PARITY D13.) Mosaic DMA slices
            must be sublane-aligned, so each DMA moves the aligned 8-row
            block containing g and a masked reduce picks the row out."""
            swap = (0, 2, 1, 3)                # comp (p,q) <- plane (q,p)
            if interpret:
                return [mm0_ref[swap[c], g][None] for c in range(4)]
            g8 = (g // 8) * 8
            sub = g - g8
            rid = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
            out = []
            # one (8, N) buffer reused across the four comps (the
            # (4, 8, N) variant cost an extra 1.5 MB of scoped VMEM
            # for nothing — the four DMAs are sequential anyway)
            for c in range(4):
                copy = pltpu.make_async_copy(
                    mm0_ref.at[swap[c], pl.ds(g8, 8), :], colbuf, sem)
                copy.start()
                copy.wait()
                blk = colbuf[...]                                # (8, N)
                out.append(jnp.sum(
                    jnp.where(rid == sub, blk, jnp.zeros_like(blk)),
                    axis=0, keepdims=True))
            return out

        for j in range(M):
            zj0 = zs_ref[j, 0]
            zj1 = zs_ref[j, 1]
            v = valid_ref[0, j] != 0

            # ---- association / slot choice ----
            if known:
                g = ids_ref[0, j]
                # out-of-range id -> no-op, matching the XLA scan path
                # (blocked_ekf owns = (j_loc >= 0) & (j_loc < n_local):
                # the strip write and the grid-pass scatter never match)
                in_range = (g >= 0) & (g < N)
                g = jnp.clip(g, 0, N - 1)
                seen_g = _extract(lane, seen, g) > f32(0.5)
                is_new = v & in_range & ~seen_g
                do_update = v & in_range & seen_g
                is_overflow = jnp.bool_(False)
            else:
                act = v & ~stopped
                # componentwise psi = H5 S5 H5^T + R over all N slots
                # (the _associate_comp math, on (1, N) rows)
                dxv = mm[0] - x
                dyv = mm[1] - y
                dv = jnp.maximum(dxv * dxv + dyv * dyv, f32(1e-12))
                sqv = jnp.sqrt(dv)
                av = dxv / sqv
                bv = dyv / sqv
                cv = dyv / dv
                ev = -dxv / dv
                zerov = jnp.zeros_like(dxv)
                onev = jnp.ones_like(dxv)
                w = ((zerov, -av, -bv, av, bv), (-onev, cv, ev, -cv, -ev))
                psi = [[None, None], [None, None]]
                for l in range(2):
                    wl = w[l]
                    u = []
                    for k in range(3):
                        u.append(crr[k][0] * wl[0] + crr[k][1] * wl[1]
                                 + crr[k][2] * wl[2]
                                 + rm[k * 2 + 0] * wl[3]
                                 + rm[k * 2 + 1] * wl[4])
                    for p in range(2):
                        u.append(rm[0 + p] * wl[0] + rm[2 + p] * wl[1]
                                 + rm[4 + p] * wl[2]
                                 + dg[p * 2 + 0] * wl[3]
                                 + dg[p * 2 + 1] * wl[4])
                    for p in range(2):
                        wp = w[p]
                        psi[p][l] = (wp[0] * u[0] + wp[1] * u[1]
                                     + wp[2] * u[2] + wp[3] * u[3]
                                     + wp[4] * u[4]) + R[p][l]
                detv = psi[0][0] * psi[1][1] - psi[0][1] * psi[1][0]
                zh1v = _norm_angle(_atan2(dyv, dxv) - th)
                dz0v = zj0 - sqv
                dz1v = zj1 - zh1v
                if wrap_innovation:
                    dz1v = _norm_angle(dz1v)
                distv = (dz0v * (psi[1][1] * dz0v - psi[0][1] * dz1v)
                         + dz1v * (-psi[1][0] * dz0v + psi[0][0] * dz1v)
                         ) / detv
                seenb = seen > f32(0.5)
                hit = seenb & (distv < f32(new_gate))
                idx = jnp.where(hit, lane, INT_MAX)
                first = jnp.min(idx)
                any_hit = first < INT_MAX
                first_safe = jnp.where(any_hit, first, 0)
                dist_noinf = jnp.where(seenb, distv, jnp.zeros_like(distv))
                d_first = jnp.where(any_hit,
                                    _extract(lane, dist_noinf, first_safe),
                                    f32(0.0))
                no_seen = n_seen == 0
                cap_full = n_seen >= N
                first_match = d_first < f32(match_gate)
                is_match = act & ~no_seen & any_hit & first_match
                want_new = act & (no_seen | ~any_hit)
                is_new = want_new & ~cap_full
                is_overflow = want_new & cap_full
                do_update = is_match
                new_slot = jnp.minimum(n_seen, N - 1)
                g = jnp.where(is_match, first_safe, new_slot)

            # ---- measurement geometry at slot g ----
            mjx = _extract(lane, mm[0], g)
            mjy = _extract(lane, mm[1], g)
            dx = mjx - x
            dy = mjy - y
            d = jnp.maximum(dx * dx + dy * dy, f32(1e-12))
            sq = jnp.sqrt(d)
            z_hat1 = _norm_angle(_atan2(dy, dx) - th)
            dz0 = zj0 - sq
            dz1 = zj1 - z_hat1
            if wrap_innovation:
                dz1 = _norm_angle(dz1)
            # H5 rows (scalars): [0, -dx/sq, -dy/sq, dx/sq, dy/sq],
            #                    [-1, dy/d, -dx/d, -dy/d, dx/d]
            H5 = ((f32(0.0), -dx / sq, -dy / sq, dx / sq, dy / sq),
                  (f32(-1.0), dy / d, -dx / d, -dy / d, dx / d))

            # ---- UPDATE branch ----
            rmj = [[_extract(lane, rm[i * 2 + p], g) for p in range(2)]
                   for i in range(3)]
            SHt_r = [[crr[i][0] * H5[q][0] + crr[i][1] * H5[q][1]
                      + crr[i][2] * H5[q][2]
                      + rmj[i][0] * H5[q][3] + rmj[i][1] * H5[q][4]
                      for q in range(2)] for i in range(3)]

            # column g after ops 0..j-1: fetch + replay (same algebra as
            # the XLA col_at)
            col = fetch_col(g)
            for i in range(j):
                is_upd_i = kinds[i] == 1
                is_init_i = kinds[i] == 2
                s_i = gs[i]
                kb = [Kb_o[4 * i + c:4 * i + c + 1, :] for c in range(4)]
                hs = [_extract(lane, HSb_o[4 * i + c:4 * i + c + 1, :], g)
                      for c in range(4)]
                wu = jnp.where(is_upd_i, f32(1.0), f32(0.0))
                col = [col[0] - wu * (kb[0] * hs[0] + kb[1] * hs[1]),
                       col[1] - wu * (kb[0] * hs[2] + kb[1] * hs[3]),
                       col[2] - wu * (kb[2] * hs[0] + kb[3] * hs[1]),
                       col[3] - wu * (kb[2] * hs[2] + kb[3] * hs[3])]
                # init at s_i == g: whole column <- cross strip (comp
                # (p,q) of the column is comp (q,p) of the stored strip)
                sel_c = is_init_i & (s_i == g)
                crb = [CRb_o[4 * i + c:4 * i + c + 1, :] for c in range(4)]
                perm = (0, 2, 1, 3)
                col = [jnp.where(sel_c, crb[perm[c]], col[c])
                       for c in range(4)]
                # init elsewhere: row s_i of this column <- strip col g
                cr_g = [_extract(lane, crb[c], g) for c in range(4)]
                rowm = is_init_i & (s_i != g)
                col = [jnp.where(rowm & (lane == s_i),
                                 jnp.full_like(col[c], cr_g[c]), col[c])
                       for c in range(4)]

            # SHt comps s4[p*2+q] over the strip
            s4 = [rm[0 + p] * H5[q][0] + rm[2 + p] * H5[q][1]
                  + rm[4 + p] * H5[q][2]
                  + col[p * 2 + 0] * H5[q][3] + col[p * 2 + 1] * H5[q][4]
                  for p in range(2) for q in range(2)]
            shtj = [[_extract(lane, s4[p * 2 + q], g) for q in range(2)]
                    for p in range(2)]
            psi_s = [[H5[q][0] * SHt_r[0][r] + H5[q][1] * SHt_r[1][r]
                      + H5[q][2] * SHt_r[2][r]
                      + H5[q][3] * shtj[0][r] + H5[q][4] * shtj[1][r]
                      + R[q][r]
                      for r in range(2)] for q in range(2)]
            i00, i01, i10, i11 = _inv2x2_s(psi_s[0][0], psi_s[0][1],
                                           psi_s[1][0], psi_s[1][1])
            inv = ((i00, i01), (i10, i11))
            K_r = [[SHt_r[i][0] * inv[0][q] + SHt_r[i][1] * inv[1][q]
                    for q in range(2)] for i in range(3)]
            k4 = [s4[p * 2 + 0] * inv[0][r] + s4[p * 2 + 1] * inv[1][r]
                  for p in range(2) for r in range(2)]

            upd_th = _norm_angle(
                th + K_r[0][0] * dz0 + K_r[0][1] * dz1)
            upd_x = x + K_r[1][0] * dz0 + K_r[1][1] * dz1
            upd_y = y + K_r[2][0] * dz0 + K_r[2][1] * dz1
            upd_mm = [mm[0] + k4[0] * dz0 + k4[1] * dz1,
                      mm[1] + k4[2] * dz0 + k4[3] * dz1]
            ucrr = [[crr[i][k] - (K_r[i][0] * SHt_r[k][0]
                                  + K_r[i][1] * SHt_r[k][1])
                     for k in range(3)] for i in range(3)]
            if symmetrize:
                ucrr = [[f32(0.5) * (ucrr[i][k] + ucrr[k][i])
                         for k in range(3)] for i in range(3)]
            upd_rm = [rm[i * 2 + p]
                      - (K_r[i][0] * s4[p * 2 + 0]
                         + K_r[i][1] * s4[p * 2 + 1])
                      for i in range(3) for p in range(2)]
            upd_dg = [dg[p * 2 + r]
                      - (k4[p * 2 + 0] * s4[r * 2 + 0]
                         + k4[p * 2 + 1] * s4[r * 2 + 1])
                      for p in range(2) for r in range(2)]

            # ---- INIT branch ----
            aa = zj1 + th
            r_ = zj0
            sa = jnp.sin(aa)
            ca = jnp.cos(aa)
            m_new = (x + r_ * ca, y + r_ * sa)
            Gx = ((-r_ * sa, f32(1.0), f32(0.0)),
                  (r_ * ca, f32(0.0), f32(1.0)))
            Gz = ((ca, -r_ * sa), (sa, r_ * ca))
            cross4 = [Gx[p][0] * rm[0 + q] + Gx[p][1] * rm[2 + q]
                      + Gx[p][2] * rm[4 + q]
                      for p in range(2) for q in range(2)]
            # B_own = Gx Srr Gx^T + Gz R Gz^T (scalars)
            GS = [[Gx[p][0] * crr[0][k] + Gx[p][1] * crr[1][k]
                   + Gx[p][2] * crr[2][k] for k in range(3)]
                  for p in range(2)]
            GR = [[Gz[p][0] * R[0][v] + Gz[p][1] * R[1][v]
                   for v in range(2)] for p in range(2)]
            B = [[GS[p][0] * Gx[q][0] + GS[p][1] * Gx[q][1]
                  + GS[p][2] * Gx[q][2]
                  + GR[p][0] * Gz[q][0] + GR[p][1] * Gz[q][1]
                  for q in range(2)] for p in range(2)]
            # pre-patch the own column with B_own
            cross4 = [_scatter(lane, cross4[p * 2 + q], g, B[p][q])
                      for p in range(2) for q in range(2)]
            # cross_r[i][p] = (Gx Srr)^T = sum_k Gx[p,k] Srr[k,i]
            cross_r = [[Gx[p][0] * crr[0][i] + Gx[p][1] * crr[1][i]
                        + Gx[p][2] * crr[2][i] for p in range(2)]
                       for i in range(3)]
            ini_mm = [_scatter(lane, mm[p], g, m_new[p]) for p in range(2)]
            ini_rm = [_scatter(lane, rm[i * 2 + p], g, cross_r[i][p])
                      for i in range(3) for p in range(2)]
            seen_new = _scatter(lane, seen, g, f32(1.0))

            # ---- select sequential state ----
            wu = do_update
            wn = is_new
            th = jnp.where(wu, upd_th, th)
            x = jnp.where(wu, upd_x, x)
            y = jnp.where(wu, upd_y, y)
            mm = [jnp.where(wu, upd_mm[p],
                            jnp.where(wn, ini_mm[p], mm[p]))
                  for p in range(2)]
            crr = [[jnp.where(wu, ucrr[i][k], crr[i][k]) for k in range(3)]
                   for i in range(3)]
            rm = [jnp.where(wu, upd_rm[c],
                            jnp.where(wn, ini_rm[c], rm[c]))
                  for c in range(6)]
            n_seen = n_seen + jnp.where(wn, 1, 0).astype(jnp.int32)
            seen = jnp.where(wn, seen_new, seen)
            dg = [jnp.where(wu, upd_dg[c], dg[c]) for c in range(4)]
            dg = [jnp.where(wn & (lane == g),
                            jnp.full_like(dg[p * 2 + q], B[p][q]),
                            dg[p * 2 + q])
                  for p in range(2) for q in range(2)]
            stopped = stopped | is_overflow

            # ---- record the op ----
            kind = jnp.where(wu, 1, jnp.where(wn, 2, 0)).astype(jnp.int32)
            kinds.append(kind)
            gs.append(g)
            fu = jnp.where(wu, f32(1.0), f32(0.0))
            fn = jnp.where(wn, f32(1.0), f32(0.0))
            for c in range(4):
                Kb_o[4 * j + c:4 * j + c + 1, :] = fu * k4[c]
                HSb_o[4 * j + c:4 * j + c + 1, :] = fu * s4[c]
                CRb_o[4 * j + c:4 * j + c + 1, :] = fn * cross4[c]
            gb_o[0, j] = jnp.where(kind > 0, g, -1)
            kind_o[0, j] = kind

        # ---- store final state ----
        mean_r_o[0, 0] = th
        mean_r_o[0, 1] = x
        mean_r_o[0, 2] = y
        for i in range(3):
            for k in range(3):
                cov_rr_o[i, k] = crr[i][k]
        nseen_o[0, 0] = n_seen
        for p in range(2):
            mm2_o[p:p + 1, :] = mm[p]
        for c in range(6):
            rm6_o[c:c + 1, :] = rm[c]
        for c in range(4):
            diag4_o[c:c + 1, :] = dg[c]
        seen_o[0:1, :] = seen

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("known", "match_gate", "new_gate", "wrap_innovation",
                     "symmetrize", "interpret"))
def deferred_seq_scan(mean_r, mm2, cov_rr, rm6, diag4, seen, n_seen,
                      mm0p, zs, valid, ids, R, *, known: bool,
                      match_gate: float, new_gate: float,
                      wrap_innovation: bool, symmetrize: bool,
                      interpret: bool = False):
    """Run the deferred tick's measurement scan in one Pallas kernel.

    Args (single shard, single batch element; component layouts):
      mean_r (3,), mm2 (2, N), cov_rr (3, 3), rm6 (6, N), diag4 (4, N),
      seen (N,) bool, n_seen () int32, mm0p (4, N, N) f32 — the frozen
      post-predict grid comp planes, exactly as carried in BlockedState
      (stays in HBM; four symmetric row slices are DMA'd per
      measurement), zs (M, 2), valid (M,) bool, ids (M,) int32
      (known-association ids; ignored when known=False), R (2, 2).

    Returns (mean_r', mm2', cov_rr', rm6', diag4', seen', n_seen',
             Kb (M, 4, N), HSb (M, 4, N), CRb (M, 4, N), gb (M,),
             kindb (M,)) — exactly the scan outputs of the XLA path.
    """
    M = zs.shape[0]
    N = mm2.shape[1]
    f32 = jnp.float32
    kernel = _make_kernel(M, N, known, float(match_gate), float(new_gate),
                          bool(wrap_innovation), bool(symmetrize),
                          bool(interpret))
    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    out_shapes = [
        jax.ShapeDtypeStruct((1, 3), f32),        # mean_r
        jax.ShapeDtypeStruct((3, 3), f32),        # cov_rr
        jax.ShapeDtypeStruct((1, 1), jnp.int32),  # n_seen
        jax.ShapeDtypeStruct((1, M), jnp.int32),  # gb
        jax.ShapeDtypeStruct((1, M), jnp.int32),  # kindb
        jax.ShapeDtypeStruct((2, N), f32),        # mm2
        jax.ShapeDtypeStruct((6, N), f32),        # rm6
        jax.ShapeDtypeStruct((4, N), f32),        # diag4
        jax.ShapeDtypeStruct((1, N), f32),        # seen
        jax.ShapeDtypeStruct((4 * M, N), f32),    # Kb
        jax.ShapeDtypeStruct((4 * M, N), f32),    # HSb
        jax.ShapeDtypeStruct((4 * M, N), f32),    # CRb
    ]
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[
            smem(), smem(), smem(), smem(), smem(), smem(), smem(),
            vmem(), vmem(), vmem(), vmem(),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            smem(), smem(), smem(), smem(), smem(),
            vmem(), vmem(), vmem(), vmem(), vmem(), vmem(), vmem(),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, N), f32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=bool(interpret),
    )(
        mean_r.reshape(1, 3).astype(f32),
        cov_rr.astype(f32),
        n_seen.reshape(1, 1).astype(jnp.int32),
        zs.astype(f32),
        valid.reshape(1, M).astype(jnp.int32),
        (ids if ids is not None else jnp.zeros((M,), jnp.int32)
         ).reshape(1, M).astype(jnp.int32),
        R.astype(f32),
        mm2.astype(f32),
        rm6.astype(f32),
        diag4.astype(f32),
        seen.reshape(1, N).astype(f32),
        mm0p.astype(f32),
    )
    (mean_r_o, cov_rr_o, nseen_o, gb_o, kind_o, mm2_o, rm6_o, diag4_o,
     seen_o, Kb_o, HSb_o, CRb_o) = outs
    return (mean_r_o.reshape(3), mm2_o, cov_rr_o, rm6_o, diag4_o,
            seen_o.reshape(N) > 0.5, nseen_o.reshape(()),
            Kb_o.reshape(M, 4, N), HSb_o.reshape(M, 4, N),
            CRb_o.reshape(M, 4, N), gb_o.reshape(M), kind_o.reshape(M))
