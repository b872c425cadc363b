"""Robot description: the TurtleBot3 burger geometry as typed data.

Equivalent of the reference ``nuturtle_description`` package (SURVEY.md D1):
the URDF xacro parameterized by ``diff_params.yaml`` defines the canonical
geometry every node reads (wheel_radius 0.033, wheel_base 0.16,
``nuturtle_description/config/diff_params.yaml:2-3``; wheel joints at
+-wheel_base/2, ``urdf/turtlebot3_burger.urdf.xacro:6-10,48,82``). There is
no rviz/gazebo here, so meshes and visual links reduce to the collision and
kinematic quantities the engine actually consumes.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..ops.diff_drive import DiffDriveParams


@dataclasses.dataclass(frozen=True)
class RobotDescription:
    name: str
    wheel_radius: float      # m
    wheel_base: float        # m (distance between wheel contact points)
    collision_radius: float  # m (planar collision disc; tube_world robot_radius)
    scanner_height: float    # m (base_scan frame height; for 3D viz only)
    body_length: float       # m footprint (visual only)
    body_width: float        # m

    def diff_drive_params(self, dtype=jnp.float32) -> DiffDriveParams:
        return DiffDriveParams(
            wheel_base=jnp.asarray(self.wheel_base, dtype),
            wheel_rad=jnp.asarray(self.wheel_radius, dtype),
        )


TURTLEBOT3_BURGER = RobotDescription(
    name="turtlebot3_burger",
    wheel_radius=0.033,      # diff_params.yaml:2
    wheel_base=0.16,         # diff_params.yaml:3
    collision_radius=0.08,   # tube_world_params.yaml:3 robot_radius
    scanner_height=0.172,
    body_length=0.138,
    body_width=0.178,
)
