from .mesh import make_camera_mesh, make_multicamera_runner, stack_states

__all__ = ["make_camera_mesh", "make_multicamera_runner", "stack_states"]
