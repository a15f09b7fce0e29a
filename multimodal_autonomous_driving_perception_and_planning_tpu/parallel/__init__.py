from .mesh import make_camera_mesh, make_multicamera_runner, stack_states
from .tp import (
    make_sharded_yolo_detector,
    make_tp_mesh,
    shard_blip_variables,
    shard_yolo_variables,
)

__all__ = [
    "make_camera_mesh",
    "make_multicamera_runner",
    "stack_states",
    "make_tp_mesh",
    "make_sharded_yolo_detector",
    "shard_yolo_variables",
    "shard_blip_variables",
]
