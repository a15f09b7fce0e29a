from .planner import plan, make_reference_path

__all__ = ["plan", "make_reference_path"]
