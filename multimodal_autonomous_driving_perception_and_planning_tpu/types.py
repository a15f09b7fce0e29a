"""Fixed-shape pytree schemas for the TPU-native AV pipeline.

The reference stack passes Python lists of dataclasses between stages
(`List[Detection]` from src/perception/detector.py:86-101, `Dict[int, Track]`
from src/tracking/multi_object_tracker.py:80, ...).  XLA requires static
shapes, so every collection becomes a fixed-capacity table with a validity
mask.  All containers here are registered pytrees (via
`jax.tree_util.register_dataclass`) so they flow through jit/scan/vmap.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def pytree_dataclass(cls):
    """Register a dataclass whose fields are all array leaves."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])


@pytree_dataclass
class Detections:
    """Fixed-capacity detection table (replaces List[Detection], detector.py:14-26).

    All arrays have leading dimension D = max_detections.
    """

    bbox: Any  # (D, 4) float32, xyxy
    class_id: Any  # (D,) int32
    confidence: Any  # (D,) float32
    valid: Any  # (D,) bool

    @property
    def center(self):
        """Box centers, ((x1+x2)/2, (y1+y2)/2) per detector.py:23-26."""
        return jnp.stack(
            [(self.bbox[..., 0] + self.bbox[..., 2]) * 0.5,
             (self.bbox[..., 1] + self.bbox[..., 3]) * 0.5],
            axis=-1,
        )

    @staticmethod
    def empty(capacity: int) -> "Detections":
        return Detections(
            bbox=jnp.zeros((capacity, 4), jnp.float32),
            class_id=jnp.zeros((capacity,), jnp.int32),
            confidence=jnp.zeros((capacity,), jnp.float32),
            valid=jnp.zeros((capacity,), bool),
        )


@pytree_dataclass
class TrackTable:
    """Fixed-slot multi-object track table.

    Replaces the reference's Dict[int, Track] with per-track Python lists
    (multi_object_tracker.py:14-47,80).  A slot is occupied iff ``track_id > 0``.
    Track IDs are assigned sequentially from ``next_id`` exactly like
    multi_object_tracker.py:214-225.
    """

    track_id: Any  # (T,) int32, 0 = free slot
    bbox: Any  # (T, 4) float32
    class_id: Any  # (T,) int32
    confidence: Any  # (T,) float32
    age: Any  # (T,) int32
    hits: Any  # (T,) int32
    misses: Any  # (T,) int32
    # Trajectory ring buffer of box centers; traj_len counts TOTAL writes
    # (it grows without bound — consumers take min(traj_len, L) for the
    # valid-entry count and traj_len % L for the ring head, see
    # host._unroll_ring; reference ring: multi_object_tracker.py:199-205).
    trajectory: Any  # (T, 2*L) float32, interleaved [x0, y0, x1, y1, ...]
    # (flat layout: a trailing dim of 2 tiles at 2/128 lanes on TPU)
    traj_len: Any  # (T,) int32
    # Last frame-diff velocity; vel_count==0 means "no velocity yet" which the
    # reference models as velocities == [] (multi_object_tracker.py:34-39).
    velocity: Any  # (T, 2) float32
    vel_count: Any  # (T,) int32
    next_id: Any  # () int32

    @property
    def alive(self):
        return self.track_id > 0

    @property
    def confirmed(self):
        """hits >= min_hits filter is applied by the tracker; this mask is
        populated there and stored in outputs, not here."""
        raise AttributeError("use tracker.confirmed_mask(table, min_hits)")

    @property
    def center(self):
        return jnp.stack(
            [(self.bbox[..., 0] + self.bbox[..., 2]) * 0.5,
             (self.bbox[..., 1] + self.bbox[..., 3]) * 0.5],
            axis=-1,
        )

    @staticmethod
    def empty(capacity: int, trajectory_length: int) -> "TrackTable":
        return TrackTable(
            track_id=jnp.zeros((capacity,), jnp.int32),
            bbox=jnp.zeros((capacity, 4), jnp.float32),
            class_id=jnp.zeros((capacity,), jnp.int32),
            confidence=jnp.zeros((capacity,), jnp.float32),
            age=jnp.zeros((capacity,), jnp.int32),
            hits=jnp.zeros((capacity,), jnp.int32),
            misses=jnp.zeros((capacity,), jnp.int32),
            trajectory=jnp.zeros((capacity, 2 * trajectory_length), jnp.float32),
            traj_len=jnp.zeros((capacity,), jnp.int32),
            velocity=jnp.zeros((capacity, 2), jnp.float32),
            vel_count=jnp.zeros((capacity,), jnp.int32),
            next_id=jnp.asarray(1, jnp.int32),
        )


@pytree_dataclass
class KalmanState:
    """6-state constant-acceleration ego Kalman filter state.

    Mirrors filterpy's (x, P) plus the reference estimator's derived-quantity
    memory (vehicle_state.py:61-66: time, prev_heading, prev_speed).
    """

    x: Any  # (6,) float32 [x, y, vx, vy, ax, ay]
    P: Any  # (6, 6) float32
    time: Any  # () float32
    prev_heading: Any  # () float32
    prev_speed: Any  # () float32

    @staticmethod
    def initial(initial_covariance: float = 10.0) -> "KalmanState":
        return KalmanState(
            x=jnp.zeros((6,), jnp.float32),
            P=jnp.eye(6, dtype=jnp.float32) * initial_covariance,
            time=jnp.asarray(0.0, jnp.float32),
            prev_heading=jnp.asarray(0.0, jnp.float32),
            prev_speed=jnp.asarray(0.0, jnp.float32),
        )


@pytree_dataclass
class VehicleState:
    """Per-frame estimated ego state (vehicle_state.py:14-30)."""

    x: Any
    y: Any
    vx: Any
    vy: Any
    heading: Any
    speed: Any
    acceleration: Any
    yaw_rate: Any
    timestamp: Any
    pos_uncertainty: Any
    vel_uncertainty: Any


@pytree_dataclass
class PlanResult:
    """Planner output: all candidates plus the selected optimum.

    The reference returns (optimal, candidates) with 21 Trajectory objects of
    51 waypoints each (motion_planner.py:264-303); here the candidate tensor
    keeps everything and `best` indexes into it.
    """

    positions: Any  # (C, N, 2) float32 world xy
    headings: Any  # (C, N) float32
    velocities: Any  # (C, N) float32
    curvatures: Any  # (C, N) float32
    timestamps: Any  # (N,) float32
    costs: Any  # (C,) float32
    lateral_offsets: Any  # (C,) float32
    target_velocities: Any  # (C,) float32
    best: Any  # () int32 argmin-cost candidate index
    order: Any  # (C,) int32 stable cost-sorted candidate order


@pytree_dataclass
class LaneState:
    """Cross-frame lane-fit memory (lane_detector.py:43-45)."""

    left_fit: Any  # (3,) float32 polynomial coeffs x = f(y)
    right_fit: Any  # (3,) float32
    left_valid: Any  # () bool  (prev fit exists)
    right_valid: Any  # () bool

    @staticmethod
    def initial() -> "LaneState":
        z = jnp.zeros((3,), jnp.float32)
        f = jnp.asarray(False)
        return LaneState(left_fit=z, right_fit=z, left_valid=f, right_valid=f)


@pytree_dataclass
class LaneObservation:
    """Per-frame lane detection output (lane_detector.py:169-174, 253-272)."""

    left_fit: Any  # (3,) float32 [a, b, c] for x = a y^2 + b y + c
    right_fit: Any  # (3,) float32
    left_found: Any  # () bool
    right_found: Any  # () bool
    left_confidence: Any  # () float32 min(1, n_lines/10)
    right_confidence: Any  # () float32
    offset_px: Any  # () float32 lane-center offset (w/2 - lane_center)
    has_offset: Any  # () bool both lanes found


@pytree_dataclass
class TaggingState:
    """Cross-frame memory of the three rule-based taggers.

    scene:     road-type vote ring (scene_classifier.py:87-89,282-298)
    maneuver:  30-deep state history (maneuver_detector.py:99-103)
    interact:  per-slot 30-deep center history (interaction_detector.py:127-130)
    """

    # Scene classifier: ring of last `window` road-type votes (int enum).
    scene_votes: Any  # (W,) int32
    scene_count: Any  # () int32 frames classified so far
    # Maneuver detector: rings of speed / heading / accel / yaw_rate / x / y.
    man_history: Any  # (H, 6) float32
    man_count: Any  # () int32
    # Interaction detector: per-track-slot center history ring.
    int_centers: Any  # (T, 2*H) float32, interleaved [x0, y0, ...] (flat
    # layout — a trailing dim of 2 tiles at 2/128 lanes on TPU)
    int_len: Any  # (T,) int32
    int_track_id: Any  # (T,) int32 id owning each history slot
    frame_count: Any  # () int32 (shared frame counter per tagger parity)

    @staticmethod
    def initial(
        window: int,
        history: int,
        max_tracks: int,
        interaction_history: int | None = None,
    ) -> "TaggingState":
        """``history`` sizes the maneuver ring; the interaction center ring
        has its own knob (TaggingConfig.interaction_history) — sizing it
        from the maneuver length only works while the two defaults happen
        to coincide."""
        if interaction_history is None:
            interaction_history = history
        return TaggingState(
            scene_votes=jnp.full((window,), -1, jnp.int32),
            scene_count=jnp.asarray(0, jnp.int32),
            man_history=jnp.zeros((history, 6), jnp.float32),
            man_count=jnp.asarray(0, jnp.int32),
            int_centers=jnp.zeros(
                (max_tracks, 2 * interaction_history), jnp.float32
            ),
            int_len=jnp.zeros((max_tracks,), jnp.int32),
            int_track_id=jnp.zeros((max_tracks,), jnp.int32),
            frame_count=jnp.asarray(0, jnp.int32),
        )


@pytree_dataclass
class PipelineState:
    """Full scan carry for the fused per-frame pipeline."""

    tracks: TrackTable
    kalman: KalmanState
    lanes: LaneState
    tagging: TaggingState
    frame_idx: Any  # () int32


@pytree_dataclass
class FrameOutputs:
    """Per-frame pipeline outputs (stacked over time by lax.scan)."""

    detections: Detections
    confirmed_mask: Any  # (T,) bool
    confirmed_order: Any  # (T,) int32 slots sorted by track_id (alive first)
    num_confirmed: Any  # () int32
    track_ids: Any  # (T,) int32 snapshot
    track_bboxes: Any  # (T, 4) float32 snapshot
    vehicle_state: VehicleState
    plan_best_positions: Any  # (N, 2)
    plan_costs: Any  # (C,)
    plan_best: Any  # () int32
    lane_obs: LaneObservation
    tags: Any  # dict of tag scalars (filled by tagging stage)


def to_numpy(tree):
    """Device pytree -> host numpy pytree."""
    return jax.tree_util.tree_map(np.asarray, tree)
