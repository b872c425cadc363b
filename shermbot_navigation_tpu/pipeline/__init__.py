"""In-process pipeline: the jitted equivalent of the reference's ROS launch
graphs (sim -> perception -> EKF), plus configs, metrics, checkpointing."""
