"""Pallas TPU kernels for the hot SLAM ops.

BASELINE.json names two kernels to hand-write: the EKF covariance update and
the circle fit. XLA already fuses most of this pipeline well; these kernels
exist for the large-map regimes where explicit tiling, in-place aliasing and
VMEM residency beat the XLA default schedule:

- ``cov_update``     — fused Kalman gain + mean update + rank-2 covariance
                       downdate, tiled over covariance rows (dense engine)
- ``circle_moments`` — masked centroid/moment-matrix assembly for the
                       batched circle fit front-end
- ``grid_update``    — the deferred rank-2M landmark-grid pass of the
                       blocked EKF (config 4's dominant op): init-overwrite
                       replay + masked rank-2M subtraction in one HBM pass

Each kernel ships with an ``interpret=True`` path so the exact kernel code
is unit-tested on CPU; the TPU path is exercised by the benchmarks.
"""

from .cov_update import fused_kalman_update
from .circle_moments import circle_moments
from .grid_update import fused_grid_update
