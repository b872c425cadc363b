"""Simulation: vectorized tube world, lidar model, minimal kinematic turtle."""
