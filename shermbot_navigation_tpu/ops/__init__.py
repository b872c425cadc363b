"""Numeric core ops: SE(2) algebra, kinematics, perception math, Pallas kernels."""
