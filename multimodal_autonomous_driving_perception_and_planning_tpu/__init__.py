"""TPU-native multimodal autonomous-driving perception & planning framework.

A ground-up JAX/XLA rebuild of the capabilities of
``bhavyageethika/multimodal_autonomous_driving_perception_and_planning``
(camera-to-plan AV stack: detection, lane finding, multi-object tracking,
ego Kalman estimation, quintic-polynomial motion planning, auto-tagging,
searchable tag database, BEV/overlay visualization, CLI + dashboard apps),
re-designed TPU-first: fixed-shape pytrees, one fused jitted per-frame step,
`lax.scan` over frames, `vmap` over agents/candidates/cameras, and
`shard_map` over device meshes for multi-camera scale-out.
"""

__version__ = "0.1.0"

from .config import (
    DEFAULT_CONFIG,
    PipelineConfig,
    DetectorConfig,
    LaneConfig,
    TrackerConfig,
    EstimatorConfig,
    PlannerConfig,
    TaggingConfig,
    BEVConfig,
    MeshConfig,
)
from .types import (
    Detections,
    TrackTable,
    KalmanState,
    VehicleState,
    PlanResult,
    LaneState,
    LaneObservation,
    TaggingState,
    PipelineState,
)
from .pipeline import (
    initial_state,
    make_pipeline_step,
    make_sequence_runner,
    detections_from_arrays,
)

__all__ = [
    "DEFAULT_CONFIG",
    "PipelineConfig",
    "DetectorConfig",
    "LaneConfig",
    "TrackerConfig",
    "EstimatorConfig",
    "PlannerConfig",
    "TaggingConfig",
    "BEVConfig",
    "MeshConfig",
    "Detections",
    "TrackTable",
    "KalmanState",
    "VehicleState",
    "PlanResult",
    "LaneState",
    "LaneObservation",
    "TaggingState",
    "PipelineState",
    "initial_state",
    "make_pipeline_step",
    "make_sequence_runner",
    "detections_from_arrays",
]
