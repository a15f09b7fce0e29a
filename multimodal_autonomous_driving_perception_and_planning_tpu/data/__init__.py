from .synthetic import (
    simulated_detection_stream,
    ego_motion_stream,
    simulated_vehicle_motion_stream,
    device_detection_stream,
    generate_agent_trajectories,
)

__all__ = [
    "simulated_detection_stream",
    "ego_motion_stream",
    "simulated_vehicle_motion_stream",
    "device_detection_stream",
    "generate_agent_trajectories",
]
