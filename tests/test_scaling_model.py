"""Multi-host scaling contract for the map-sharded EKF.

BASELINE.md target 3 (>= 80% efficiency from 1 host to 2 hosts) rests on
one design property of parallel/blocked_ekf.py: every per-measurement
collective is O(N) bytes (owner-broadcast psum packets + one (N, 2, 2)
all_gather of the H-Sigma strip) while per-shard covariance work is
O(N^2 / P). These tests read the collectives out of the *compiled* HLO —
the same extraction benchmarks/bench_scaling.py uses — so a change that
sneaks an O(N^2) buffer into a collective (e.g. gathering cov_mm rows)
fails here long before anyone reaches multi-host hardware.

Runs on the 8 virtual CPU devices from conftest.
"""

import pytest

from benchmarks import bench_scaling


@pytest.fixture(scope="module")
def hlo_pair():
    # two sizes on the same 8-shard mesh -> observe scaling of comm volume
    return {N: bench_scaling.lower_one_step(N, 8) for N in (256, 1024)}


def test_collective_volume_is_linear_in_N(hlo_pair):
    per_n = {N: sum(bench_scaling.collective_bytes(h).values())
             for N, h in hlo_pair.items()}
    for N, total in per_n.items():
        assert total > 0, "expected collectives in the sharded step"
        # 16 bytes/landmark for the all_gather + O(1) psum packets
        assert total <= 16 * N + 4096, (N, total)
    # quadrupling N must not quadruple-squared the traffic: ratio ~4, not 16
    ratio = per_n[1024] / per_n[256]
    assert ratio < 6.0, ratio


def test_no_quadratic_collective(hlo_pair):
    # no single collective op may move anything near N^2 (cov_mm rows are
    # (N/P, 2, N, 2) f32 = 2 MB at N=1024, P=8; the O(N) budget is ~16 KB)
    for N, h in hlo_pair.items():
        for op, nbytes in bench_scaling.collective_bytes(h).items():
            assert nbytes < 4 * N * N / 8, (N, op, nbytes)


def test_projected_2host_efficiency_meets_target(hlo_pair):
    total = sum(bench_scaling.collective_bytes(hlo_pair[1024]).values())
    # scale the measured bytes/landmark to config-4 size (bytes are exactly
    # linear in N per the test above)
    bytes_2048 = total * 2048 // 1024
    proj = bench_scaling.project(2048, 16, bytes_2048)
    assert proj["projected_2host_efficiency"] >= 0.80, proj
