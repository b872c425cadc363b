"""Scan -> landmark detections: the perception stage as one pure function.

TPU-native equivalent of the reference ``landmarks`` node
(``nuslam/src/landmarks.cpp``): cluster the scan, classify clusters as
circles, fit circles, and emit robot-frame landmark positions. The ROS
callback + 10 Hz loop + MarkerArray plumbing becomes a single jitted
function returning padded detections + a validity mask.

Filtering matches the node exactly (ref landmarks.cpp:84-105):
- non-circle clusters dropped (classifyCluster);
- degenerate fits dropped (``marker.id < 0``, i.e. < 4 points);
- fitted radius > 1 m dropped (ref :95-97);
- positions are the fitted centers; radii are overridden with the known
  tube radius (ref :100-105) — radii are therefore not part of the output.

Detections keep cluster order (the reference re-ids sequentially 0,1,2,...;
order is what matters for the EKF's sequential update semantics).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .circle_fit import fit_circles
from .clustering import classify_clusters, cluster_scan


class Detections(NamedTuple):
    positions: jnp.ndarray  # (C, 2) robot-frame landmark centers, compacted
    valid: jnp.ndarray      # (C,) detection mask


def detect_landmarks(ranges, min_range, max_range,
                     max_clusters: int = 16, max_points: int = 64,
                     max_radius: float = 1.0) -> Detections:
    """Full perception stage for one scan (vmap over a batch of scans for
    many robots/sequences at once)."""
    clusters = cluster_scan(ranges, min_range, max_range,
                            max_clusters=max_clusters, max_points=max_points)
    is_circle = classify_clusters(clusters)
    fits = fit_circles(clusters)
    ok = is_circle & fits.valid & (fits.radius <= max_radius)

    # compact valid detections to the front, preserving order (stable);
    # the permutation is applied with a one-hot matmul, not fancy
    # indexing (a vmapped gather — slow on TPU, BENCH_NOTES pathology 15
    # family)
    C = ok.shape[0]
    order = jnp.argsort(jnp.where(ok, jnp.arange(C), C), stable=True)
    perm = (order[:, None] == jnp.arange(C)[None, :]).astype(
        fits.center.dtype)                                   # (C, C)
    positions = jnp.matmul(perm, fits.center,
                           precision=jax.lax.Precision.HIGHEST)
    valid = jnp.matmul(perm, ok.astype(fits.center.dtype),
                       precision=jax.lax.Precision.HIGHEST) > 0.5
    return Detections(positions=positions, valid=valid)
