"""Estimation models: EKF-SLAM filter, pose-graph optimizer, Schur refinement."""
