from .profiler import FrameTimer, device_trace
from .checkpoint import save_pipeline_state, restore_pipeline_state
from .metrics import MetricsLogger

__all__ = [
    "FrameTimer",
    "device_trace",
    "save_pipeline_state",
    "restore_pipeline_state",
    "MetricsLogger",
]
