"""Host-side result records.

The device pipeline emits fixed-shape tensors; user-facing surfaces
(visualization, tagging aggregation, the tag database, the apps) want the
reference's record shapes — lists of detections, tracks with trajectories,
a VehicleState, Trajectory objects (detector.py:14-26,
multi_object_tracker.py:14-47, vehicle_state.py:14-30,
motion_planner.py:14-54).  This module converts stacked scan outputs into
those per-frame records on the host, after the device work is done.
"""

from __future__ import annotations

import collections
import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

CLASS_NAMES = (
    "car",
    "truck",
    "pedestrian",
    "cyclist",
    "motorcycle",
    "bus",
    "traffic_light",
    "stop_sign",
)

# BGR per class (detector.py:51-60).
CLASS_COLORS = {
    0: (0, 255, 0),
    1: (0, 165, 255),
    2: (0, 0, 255),
    3: (255, 255, 0),
    4: (255, 0, 255),
    5: (0, 255, 255),
    6: (128, 0, 128),
    7: (0, 128, 255),
}


@dataclasses.dataclass
class HostDetection:
    bbox: Tuple[float, float, float, float]
    class_id: int
    class_name: str
    confidence: float

    @property
    def center(self) -> Tuple[float, float]:
        x1, y1, x2, y2 = self.bbox
        return ((x1 + x2) / 2, (y1 + y2) / 2)


@dataclasses.dataclass
class HostTrack:
    track_id: int
    bbox: Tuple[float, float, float, float]
    class_id: int
    class_name: str
    confidence: float
    age: int
    hits: int
    misses: int
    trajectory: List[Tuple[float, float]]
    velocity: Optional[Tuple[float, float]]

    @property
    def center(self) -> Tuple[float, float]:
        x1, y1, x2, y2 = self.bbox
        return ((x1 + x2) / 2, (y1 + y2) / 2)

    def predict_next_position(self) -> Tuple[float, float]:
        """Constant-velocity next-center prediction
        (multi_object_tracker.py:41-47)."""
        cx, cy = self.center
        if self.velocity:
            vx, vy = self.velocity
            return (cx + vx, cy + vy)
        return (cx, cy)


def get_all_trajectories(tracks: List["HostTrack"]) -> Dict[int, List[Tuple[float, float]]]:
    """{track_id: trajectory} for confirmed tracks
    (multi_object_tracker.py:243-249; the confirmed filter is already applied
    when `extract_frame` builds the track list)."""
    return {t.track_id: list(t.trajectory) for t in tracks}


def get_lane_center_offset(
    frame_width: int,
    left_points: Optional[np.ndarray],
    right_points: Optional[np.ndarray],
) -> Optional[float]:
    """Vehicle offset from lane center in pixels, from rasterized lane
    points (lane_detector.py:253-272).  Negative = lane center right of the
    vehicle.  Returns None unless both lanes exist."""
    if left_points is None or right_points is None:
        return None
    lane_center = (float(left_points[-1, 0]) + float(right_points[-1, 0])) / 2
    return frame_width / 2 - lane_center


@dataclasses.dataclass
class HostVehicleState:
    x: float
    y: float
    vx: float
    vy: float
    heading: float
    speed: float
    acceleration: float
    yaw_rate: float
    timestamp: float
    pos_uncertainty: float = 0.0
    vel_uncertainty: float = 0.0


@dataclasses.dataclass
class HostTrajectory:
    positions: np.ndarray  # (N, 2)
    velocities: np.ndarray  # (N,)
    cost: float
    trajectory_type: str

    def get_positions(self) -> np.ndarray:
        return self.positions


@dataclasses.dataclass
class FrameResult:
    frame_idx: int
    detections: List[HostDetection]
    tracks: List[HostTrack]
    vehicle_state: HostVehicleState
    optimal_trajectory: HostTrajectory
    candidate_trajectories: List[HostTrajectory]
    lane_left: Optional[np.ndarray]  # (3,) poly coeffs or None
    lane_right: Optional[np.ndarray]
    lane_offset: Optional[float]
    tags: Dict


def _unroll_ring(ring: np.ndarray, count: int) -> List[Tuple[float, float]]:
    cap = ring.shape[0]
    if count <= cap:
        pts = ring[:count]
    else:
        k = count % cap
        pts = np.concatenate([ring[k:], ring[:k]])
    return [tuple(p) for p in pts]


def trajectory_type_of(lateral_offset: float) -> str:
    """Alias of planning.planner.trajectory_type (single source for the
    0.5 m lane-keep/lane-change threshold, motion_planner.py:288-294)."""
    from .planning.planner import trajectory_type

    return trajectory_type(lateral_offset)


def extract_frame(outs: Dict, dets_in: Dict, f: int) -> FrameResult:
    """Build the FrameResult for frame f from numpy-converted scan outputs.

    Args:
      outs: dict of stacked outputs (already np.asarray-able).
      dets_in: the detection input stream dict (bbox/class_id/confidence/valid).
    """
    g = lambda k: np.asarray(outs[k])  # noqa: E731

    detections = []
    valid = np.asarray(dets_in["valid"])[f]
    for j in np.flatnonzero(valid):
        cid = int(np.asarray(dets_in["class_id"])[f, j])
        detections.append(
            HostDetection(
                bbox=tuple(np.asarray(dets_in["bbox"])[f, j].tolist()),
                class_id=cid,
                class_name=CLASS_NAMES[cid],
                confidence=float(np.asarray(dets_in["confidence"])[f, j]),
            )
        )

    tracks = []
    order = g("confirmed_order")[f]
    n = int(g("num_confirmed")[f])
    for s in order[:n]:
        cid = int(g("track_class_id")[f, s])
        vel_count = int(g("track_vel_count")[f, s])
        tracks.append(
            HostTrack(
                track_id=int(g("track_id")[f, s]),
                bbox=tuple(g("track_bbox")[f, s].tolist()),
                class_id=cid,
                class_name=CLASS_NAMES[cid],
                confidence=float(g("track_confidence")[f, s]),
                age=int(g("track_age")[f, s]),
                hits=int(g("track_hits")[f, s]),
                misses=int(g("track_misses")[f, s]),
                trajectory=_unroll_ring(
                    g("track_trajectory")[f, s].reshape(-1, 2),
                    int(g("track_traj_len")[f, s]),
                ),
                velocity=(
                    tuple(g("track_velocity")[f, s].tolist()) if vel_count > 0 else None
                ),
            )
        )

    vs = outs["vehicle_state"]
    vstate = HostVehicleState(
        **{
            k: float(np.asarray(getattr(vs, k))[f])
            for k in (
                "x",
                "y",
                "vx",
                "vy",
                "heading",
                "speed",
                "acceleration",
                "yaw_rate",
                "timestamp",
                "pos_uncertainty",
                "vel_uncertainty",
            )
        }
    )

    costs = g("plan_costs")[f]
    positions = g("plan_positions")[f]
    velocities = g("plan_velocities")[f]
    lat_offs = g("plan_lateral_offsets")[f]
    cand_order = g("plan_order")[f]
    candidates = [
        HostTrajectory(
            positions=positions[c],
            velocities=velocities[c],
            cost=float(costs[c]),
            trajectory_type=trajectory_type_of(float(lat_offs[c])),
        )
        for c in cand_order
    ]
    optimal = candidates[0]

    lane_left = lane_right = None
    lane_offset = None
    if "lane_obs" in outs:
        lo = outs["lane_obs"]
        if bool(np.asarray(lo.left_found)[f]):
            lane_left = np.asarray(lo.left_fit)[f]
        if bool(np.asarray(lo.right_found)[f]):
            lane_right = np.asarray(lo.right_fit)[f]
        if bool(np.asarray(lo.has_offset)[f]):
            lane_offset = float(np.asarray(lo.offset_px)[f])

    tags = {}
    if "tags" in outs and outs["tags"]:
        tags = {k: np.asarray(v)[f] for k, v in outs["tags"].items()}

    return FrameResult(
        frame_idx=f,
        detections=detections,
        tracks=tracks,
        vehicle_state=vstate,
        optimal_trajectory=optimal,
        candidate_trajectories=candidates,
        lane_left=lane_left,
        lane_right=lane_right,
        lane_offset=lane_offset,
        tags=tags,
    )


class EgoStateHistory:
    """Host-side ego-state history with the reference estimator's getter
    surface (vehicle_state.py:200-240), capped at 1000 entries (:134-135).

    The device pipeline emits the per-frame VehicleState stacked over time;
    feed that in with `extend_from_outputs` (or append individual states).
    """

    def __init__(self, cap: int = 1000):
        self.cap = cap
        self._states: "collections.deque[HostVehicleState]" = collections.deque(
            maxlen=cap
        )

    def append(self, state: HostVehicleState) -> None:
        self._states.append(state)

    def extend_from_outputs(self, vehicle_state) -> None:
        """Ingest a stacked VehicleState pytree of (T,) arrays."""
        fields = (
            "x", "y", "vx", "vy", "heading", "speed", "acceleration",
            "yaw_rate", "timestamp", "pos_uncertainty", "vel_uncertainty",
        )
        cols = {k: np.asarray(getattr(vehicle_state, k)) for k in fields}
        for f in range(len(cols["x"])):
            self.append(HostVehicleState(**{k: float(v[f]) for k, v in cols.items()}))

    def get_state_history(self, n: Optional[int] = None) -> List[HostVehicleState]:
        states = list(self._states)
        if n is None:
            return states
        return states[-n:]

    def get_trajectory(self) -> np.ndarray:
        if not self._states:
            return np.array([])
        return np.array([[s.x, s.y] for s in self._states])

    def get_velocity_history(self) -> np.ndarray:
        if not self._states:
            return np.array([])
        return np.array([[s.vx, s.vy] for s in self._states])

    def get_speed_history(self) -> Tuple[np.ndarray, np.ndarray]:
        if not self._states:
            return np.array([]), np.array([])
        t = np.array([s.timestamp for s in self._states])
        return t, np.array([s.speed for s in self._states])

    def get_heading_history(self) -> Tuple[np.ndarray, np.ndarray]:
        if not self._states:
            return np.array([]), np.array([])
        t = np.array([s.timestamp for s in self._states])
        return t, np.array([s.heading for s in self._states])

    def reset(self) -> None:
        self._states.clear()


def lane_points(fit: np.ndarray, frame_height: int, n: int = 50) -> np.ndarray:
    """Rasterize a lane polynomial like lane_detector.py:163-167."""
    ys = np.linspace(frame_height * 0.6, frame_height, n)
    xs = np.polyval(fit, ys)
    return np.column_stack([xs, ys]).astype(np.int32)
