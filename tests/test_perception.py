"""Perception tests: circle-fit golden vectors (the reference's only numeric
fixtures, nuslam/tests/circle_tests.cpp), clustering semantics, classifier."""

import jax.numpy as jnp
import numpy as np
import pytest

from shermbot_navigation_tpu.ops import circle_fit as cf
from shermbot_navigation_tpu.ops import clustering as cl
from shermbot_navigation_tpu.ops.landmark_detection import detect_landmarks


class TestCircleFitGolden:
    def test_golden_vector_1(self):
        # ref circle_tests.cpp:38-40
        pts = jnp.array([[1, 7], [2, 6], [5, 8], [7, 7], [9, 5], [3, 7]],
                        jnp.float64)
        center, radius = cf.fit_points(pts)
        np.testing.assert_allclose(center, [4.615482, 2.807354], atol=1e-4)
        # the reference test asserts scale.x == 4.827575 (circle_tests.cpp:40);
        # scale.x is set to 2*radius in the marker, so the fixture value is in
        # fact the fitted radius itself (SURVEY.md section 4 notes the quirk)
        np.testing.assert_allclose(radius, 4.827575, atol=1e-4)

    def test_golden_vector_2(self):
        # ref circle_tests.cpp:67-69
        pts = jnp.array([[-1, 0], [-0.3, -0.06], [0.3, 0.1], [1, 0]],
                        jnp.float64)
        center, radius = cf.fit_points(pts)
        np.testing.assert_allclose(center, [0.4908357, -22.15212], atol=1e-4)
        np.testing.assert_allclose(radius, 22.17979, atol=1e-3)

    def test_exact_circle_recovery(self):
        rng = np.random.default_rng(0)
        for _ in range(5):
            c = rng.uniform(-2, 2, 2)
            r = rng.uniform(0.1, 1.5)
            th = rng.uniform(0, 2 * np.pi, 12)
            pts = jnp.asarray(c + r * np.stack([np.cos(th), np.sin(th)], -1))
            center, radius = cf.fit_points(pts)
            np.testing.assert_allclose(center, c, atol=1e-8)
            np.testing.assert_allclose(radius, r, atol=1e-8)

    def test_noisy_circle_close(self):
        rng = np.random.default_rng(1)
        c, r = np.array([0.5, -0.3]), 0.8
        th = np.linspace(0, np.pi, 20)
        pts = c + r * np.stack([np.cos(th), np.sin(th)], -1)
        pts += rng.normal(0, 0.005, pts.shape)
        center, radius = cf.fit_points(jnp.asarray(pts))
        np.testing.assert_allclose(center, c, atol=0.02)
        np.testing.assert_allclose(radius, r, atol=0.02)

    def test_batched_matches_single(self):
        pts6 = np.array([[1, 7], [2, 6], [5, 8], [7, 7], [9, 5], [3, 7]],
                        np.float64)
        P = 16
        buf = np.zeros((2, P, 2))
        buf[0, :6] = pts6
        buf[1, :4] = [[-1, 0], [-0.3, -0.06], [0.3, 0.1], [1, 0]]
        clusters = cl.Clusters(
            points=jnp.asarray(buf),
            counts=jnp.array([6, 4]),
            valid=jnp.array([True, True]),
        )
        fits = cf.fit_circles(clusters)
        np.testing.assert_allclose(fits.center[0], [4.615482, 2.807354], atol=1e-4)
        np.testing.assert_allclose(fits.center[1], [0.4908357, -22.15212], atol=1e-4)
        assert bool(fits.valid[0]) and bool(fits.valid[1])

    def test_componentized_tail_matches_tensor_tail(self):
        """The r05 fully-componentized eigen-chain (_fit_tail_c — no
        (C, 4, 4) tensor anywhere) vs the tensor-form oracle, over random
        clusters incl. degenerate (< 4 points) and near-collinear sets."""
        rng = np.random.default_rng(0)
        C, P = 16, 32
        buf = np.zeros((C, P, 2))
        counts = np.zeros(C, np.int64)
        for c in range(C):
            kind = c % 4
            n = int(rng.integers(2, P))
            if kind == 0:      # clean arc
                th = np.sort(rng.uniform(0, 2.5, n))
                r = rng.uniform(0.2, 2.0)
                ctr = rng.uniform(-3, 3, 2)
                buf[c, :n] = ctr + r * np.stack(
                    [np.cos(th), np.sin(th)], -1)
            elif kind == 1:    # noisy arc
                th = np.sort(rng.uniform(0, 1.5, n))
                buf[c, :n] = rng.uniform(-2, 2, 2) + np.stack(
                    [np.cos(th), np.sin(th)], -1) + rng.normal(
                        0, 0.02, (n, 2))
            elif kind == 2:    # near-collinear (ill-conditioned)
                t = np.sort(rng.uniform(0, 1, n))
                buf[c, :n] = np.stack(
                    [t, 0.5 * t + rng.normal(0, 1e-4, n)], -1)
            else:              # random blob
                buf[c, :n] = rng.uniform(-1, 1, (n, 2))
            counts[c] = n
        clusters = cl.Clusters(
            points=jnp.asarray(buf), counts=jnp.asarray(counts),
            valid=jnp.asarray(counts >= 3))
        a = cf.fit_circles(clusters, componentized=True)
        b = cf.fit_circles(clusters, componentized=False)
        np.testing.assert_array_equal(np.asarray(a.valid),
                                      np.asarray(b.valid))
        va = np.asarray(a.valid)
        np.testing.assert_allclose(np.asarray(a.center)[va],
                                   np.asarray(b.center)[va], atol=1e-8)
        np.testing.assert_allclose(np.asarray(a.radius)[va],
                                   np.asarray(b.radius)[va], atol=1e-8)

    def test_undersized_cluster_invalid(self):
        buf = np.zeros((1, 8, 2))
        buf[0, :3] = [[0, 0], [1, 1], [2, 0]]
        clusters = cl.Clusters(
            points=jnp.asarray(buf), counts=jnp.array([3]),
            valid=jnp.array([True]))
        fits = cf.fit_circles(clusters)
        assert not bool(fits.valid[0])  # ref sentinel: < 4 points -> id = -1


def synth_scan(segments, n=360, fill=2.0):
    """Build a range array from (start, stop, value) run segments."""
    r = np.full(n, fill)
    for s, e, v in segments:
        r[s:e] = v
    return jnp.asarray(r, jnp.float64)


class TestClustering:
    MINR, MAXR = 0.05, 1.0

    def test_simple_two_clusters(self):
        scan = synth_scan([(10, 20, 0.5), (100, 110, 0.7)])
        c = cl.cluster_scan(scan, self.MINR, self.MAXR)
        got = sorted(int(x) for x in np.asarray(c.counts[c.valid]))
        assert got == [10, 10]

    def test_jump_splits(self):
        scan = synth_scan([(10, 15, 0.5), (15, 20, 0.7)])  # 0.2 jump >= 0.04
        c = cl.cluster_scan(scan, self.MINR, self.MAXR)
        got = sorted(int(x) for x in np.asarray(c.counts[c.valid]))
        assert got == [5, 5]

    def test_small_jump_merges(self):
        scan = synth_scan([(10, 15, 0.5), (15, 20, 0.52)])  # 0.02 < 0.04
        c = cl.cluster_scan(scan, self.MINR, self.MAXR)
        got = [int(x) for x in np.asarray(c.counts[c.valid])]
        assert got == [10]

    def test_out_of_range_gap_does_not_split(self):
        # ref: out-of-range rays are skipped with `continue` — the cluster
        # stays open across them ONLY if the boundary jumps are < threshold.
        # An out-of-range fill of 2.0 makes boundary jumps >= threshold, so
        # the split happens at entry. A fill *just* above max_range with a
        # small jump keeps the cluster open.
        scan = synth_scan([(10, 15, 0.99), (15, 18, 1.01), (18, 23, 0.99)])
        c = cl.cluster_scan(scan, self.MINR, self.MAXR)
        got = [int(x) for x in np.asarray(c.counts[c.valid])]
        assert got == [10]  # one cluster of the 10 in-range points

    def test_trailing_open_cluster_dropped(self):
        # cluster running to ray 359 with a wrap jump >= threshold: closes
        # normally (split at 359) -> kept
        scan = synth_scan([(350, 360, 0.5)])
        c = cl.cluster_scan(scan, self.MINR, self.MAXR)
        got = [int(x) for x in np.asarray(c.counts[c.valid])]
        assert got == [10]

    def test_wraparound_moves_last_point_to_cluster0(self):
        # in-range run crossing 0: [355..359] + [0..5]; |r[359]-r[0]| < thr.
        # Reference: points 0..4 close as cluster 0 when the jump at ray 5
        # splits; points 355..358 are in the trailing open cluster and are
        # DROPPED; point 359 alone is appended to cluster 0.
        scan = synth_scan([(355, 360, 0.5), (0, 5, 0.5)])
        c = cl.cluster_scan(scan, self.MINR, self.MAXR)
        got = [int(x) for x in np.asarray(c.counts[c.valid])]
        assert got == [6]  # 5 points + wrapped point 359

    def test_min_range_filtered(self):
        scan = synth_scan([(10, 20, 0.01)])  # below min range
        c = cl.cluster_scan(scan, self.MINR, self.MAXR)
        assert not bool(np.asarray(c.valid).any())

    def test_clusters_under_3_invalid(self):
        scan = synth_scan([(10, 12, 0.5)])  # 2-point cluster
        c = cl.cluster_scan(scan, self.MINR, self.MAXR)
        assert not bool(np.asarray(c.valid).any())


class TestClassify:
    def _mk(self, pts):
        P = 64
        buf = np.zeros((1, P, 2))
        buf[0, :len(pts)] = pts
        return cl.Clusters(points=jnp.asarray(buf),
                           counts=jnp.array([len(pts)]),
                           valid=jnp.array([True]))

    def test_arc_is_circle(self):
        th = np.linspace(0.3, 2.0, 12)
        pts = np.stack([0.5 * np.cos(th), 0.5 * np.sin(th)], -1)
        assert bool(classify := cl.classify_clusters(self._mk(pts))[0])

    def test_line_is_not_circle(self):
        t = np.linspace(0, 1, 12)
        pts = np.stack([t, 0.5 * t], -1)
        # straight line: inscribed angles are ~180 deg with tiny spread...
        # the inscribed-angle test keys on the *stddev*; for a perfect line
        # angles flip sign around the chord -> large spread. Add tiny noise
        # to avoid exact-collinearity atan2(0, x) degeneracies.
        pts += np.random.default_rng(2).normal(0, 1e-4, pts.shape)
        res = cl.classify_clusters(self._mk(pts))[0]
        assert isinstance(bool(res), bool)  # smoke: finite decision

    def test_corner_is_not_circle(self):
        # L-shaped corner: angles differ strongly between the two legs
        a = np.stack([np.linspace(0, 1, 8), np.zeros(8)], -1)
        b = np.stack([np.ones(8), np.linspace(0.1, 1, 8)], -1)
        pts = np.concatenate([a, b])
        assert not bool(cl.classify_clusters(self._mk(pts))[0])


class TestSegmentedDetect:
    """r05 segment-reduction perception path vs the buffered oracle: the
    two must agree on every detection (positions + validity + order) —
    including the wraparound append, out-of-range gaps, and degenerate
    clusters."""

    def _ab(self, ranges, min_r=0.05, max_r=1.0):
        from shermbot_navigation_tpu.ops import landmark_detection as ld
        a = ld.detect_landmarks(ranges, min_r, max_r, segmented=True)
        b = ld.detect_landmarks(ranges, min_r, max_r, segmented=False)
        np.testing.assert_array_equal(np.asarray(a.valid),
                                      np.asarray(b.valid))
        va = np.asarray(a.valid)
        np.testing.assert_allclose(np.asarray(a.positions)[va],
                                   np.asarray(b.positions)[va], atol=1e-5)

    def test_random_scans(self):
        rng = np.random.default_rng(3)
        for _ in range(12):
            # structured scans: background out-of-range + a few arcs
            ranges = np.full(360, 5.0)
            for _ in range(int(rng.integers(1, 7))):
                c = int(rng.integers(0, 360))
                w = int(rng.integers(3, 25))
                r0 = rng.uniform(0.1, 0.95)
                span = (np.arange(c - w // 2, c + w // 2) % 360)
                ranges[span] = r0 + rng.normal(0, 0.01, span.shape[0])
            self._ab(jnp.asarray(ranges, jnp.float64))

    def test_wraparound_cluster(self):
        # one arc straddling ray 0 (the ref :169-174 single-point move)
        ranges = np.full(360, 5.0)
        span = np.arange(-8, 9) % 360
        th = np.deg2rad(np.arange(-8, 9).astype(np.float64))
        # points on a circle of radius .04 centered 0.5m ahead
        d = 0.5 * np.cos(th) - np.sqrt(
            np.maximum(0.04 ** 2 - (0.5 * np.sin(th)) ** 2, 0.0))
        ranges[span] = d
        self._ab(jnp.asarray(ranges, jnp.float64))

    def test_all_out_of_range(self):
        self._ab(jnp.full((360,), 5.0, jnp.float64))

    def test_f32_matches_too(self):
        rng = np.random.default_rng(9)
        ranges = np.full(360, 5.0, np.float32)
        for c in (40, 130, 270):
            span = np.arange(c - 6, c + 7) % 360
            ranges[span] = 0.6 + rng.normal(0, 0.005, 13)
        from shermbot_navigation_tpu.ops import landmark_detection as ld
        a = ld.detect_landmarks(jnp.asarray(ranges), 0.05, 1.0,
                                segmented=True)
        b = ld.detect_landmarks(jnp.asarray(ranges), 0.05, 1.0,
                                segmented=False)
        np.testing.assert_array_equal(np.asarray(a.valid),
                                      np.asarray(b.valid))
        va = np.asarray(a.valid)
        np.testing.assert_allclose(np.asarray(a.positions)[va],
                                   np.asarray(b.positions)[va], atol=1e-3)


class TestDetect:
    def test_synthetic_tube_detected(self):
        # one tube of radius 0.0381 at (0.5, 0.0) seen from the origin:
        # compute exact ray-circle ranges for integer-degree rays
        n = 360
        r_tube, cx = 0.0381, 0.5
        ranges = np.full(n, 2.0)
        for k in range(n):
            th = np.deg2rad(k)
            # ray from origin: distance to circle centered (cx, 0)
            b = -(cx * np.cos(th))
            c = cx * cx - r_tube * r_tube
            disc = b * b - c
            if disc >= 0:
                t = -b - np.sqrt(disc)
                if t > 0:
                    ranges[k] = t
        det = detect_landmarks(jnp.asarray(ranges, jnp.float64), 0.05, 1.0)
        got = np.asarray(det.positions[det.valid])
        assert got.shape[0] == 1
        np.testing.assert_allclose(got[0], [cx, 0.0], atol=5e-3)
