"""Reference-named per-frame class facades (migration surface).

A user of the reference drives OOP classes one frame at a time
(`demo.py:97-177`).  The TPU-native production path here is the fused
scan runner (`pipeline.make_sequence_runner` — one device program for a
whole sequence); these thin classes wrap the same jitted step functions
behind the reference's exact class/method surface so existing call sites
port line-for-line:

    from multimodal_autonomous_driving_perception_and_planning_tpu.compat import (
        LaneDetector, MultiObjectTracker, VehicleStateEstimator,
        MotionPlanner, SimulatedVehicleMotion)

Every `detect`/`update`/`step`/`plan` call is a separate device dispatch,
so per-frame latency is dominated by dispatch overhead on remote-attached
runtimes — use the fused runner for throughput.  Outputs are the host
records from `host.py` (same field names as the reference dataclasses).

`AutoTagger` here extends tagging/auto_tagger.AutoTagger with the
reference's per-frame `tag_frame`.  Classes already reference-named
elsewhere (not duplicated here): `ObjectDetector` (perception/
detector.py), `VLMTagger` (tagging/vlm.py), `TagDatabase`
(database/tag_db.py), `VideoDataLoader` (data/video.py), `BEVRenderer` /
`OverlayRenderer` (viz/), `SyntheticRoadGenerator` (data/frames.py, the
reference's SyntheticDataGenerator).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .config import DEFAULT_CONFIG
from .tagging.auto_tagger import AutoTagger as _BaseAutoTagger
from .host import (
    CLASS_NAMES,
    EgoStateHistory,
    HostTrack,
    HostTrajectory,
    HostVehicleState,
    _unroll_ring,
    lane_points,
    trajectory_type_of,
)


@dataclasses.dataclass
class LaneLine:
    """Reference LaneLine (lane_detector.py:13-19)."""

    points: np.ndarray  # (50, 2) int32 raster
    side: str
    confidence: float
    polynomial: np.ndarray  # (3,) [a, b, c] for x = a y^2 + b y + c


class LaneDetector:
    """Per-frame facade over perception/lanes.py (lane_detector.py:178-218)."""

    def __init__(self, cfg=None):
        import jax

        from .perception.lanes import make_lane_step
        from .types import LaneState

        self.cfg = cfg or DEFAULT_CONFIG
        self._step = jax.jit(make_lane_step(self.cfg))
        self._initial = LaneState.initial
        self._state = LaneState.initial()

    def detect(self, frame: np.ndarray) -> Tuple[Optional[LaneLine], Optional[LaneLine]]:
        import jax.numpy as jnp

        self._state, obs, _ = self._step(
            self._state, jnp.asarray(np.asarray(frame).astype(np.int32))
        )
        h = self.cfg.frame_height

        def build(found, fit, conf, side):
            if not bool(found):
                return None
            fit = np.asarray(fit)
            return LaneLine(
                points=lane_points(fit, h, self.cfg.lanes.num_lane_points),
                side=side,
                confidence=float(conf),
                polynomial=fit,
            )

        left = build(obs.left_found, obs.left_fit, obs.left_confidence, "left")
        right = build(obs.right_found, obs.right_fit, obs.right_confidence, "right")
        return left, right

    def get_lane_center_offset(
        self,
        frame_width: int,
        left_lane: Optional[LaneLine],
        right_lane: Optional[LaneLine],
    ) -> Optional[float]:
        """lane_detector.py:253-272 — argument order matches the reference
        (frame_width first), as called positionally at reference demo.py:128
        and app.py:173."""
        if left_lane is None or right_lane is None:
            return None
        lane_center = (
            float(left_lane.points[-1, 0]) + float(right_lane.points[-1, 0])
        ) / 2
        return frame_width / 2 - lane_center

    def reset(self) -> None:
        self._state = self._initial()


class MultiObjectTracker:
    """Per-frame facade over tracking/tracker.py
    (multi_object_tracker.py:61-241).

    Unlike the reference (which accepts unbounded detection lists), the
    device table is fixed-shape: ``max_detections`` caps how many
    detections one ``update`` call may carry.  The default (32) matches
    the YOLO detector's ``max_det`` (models/yolov8.py) so a
    reference-ported YOLO pipeline never trips the capacity check; raise
    it at construction for denser scenes.
    """

    def __init__(
        self,
        iou_threshold: float = 0.3,
        max_age: int = 30,
        min_hits: int = 3,
        trajectory_length: int = 50,
        max_tracks: int = 64,
        max_detections: int = 32,
    ):
        import jax

        from .tracking.tracker import confirmed_order, tracker_update
        from .types import Detections, TrackTable

        self.cfg = DEFAULT_CONFIG.tracker.__class__(
            iou_threshold=iou_threshold,
            max_age=max_age,
            min_hits=min_hits,
            trajectory_length=trajectory_length,
            max_tracks=max_tracks,
        )
        self._d_cap = max_detections
        self._Detections = Detections
        self._empty = lambda: TrackTable.empty(max_tracks, trajectory_length)
        self._table = self._empty()

        def step(table, dets):
            table, _ = tracker_update(table, dets, self.cfg)
            order, n = confirmed_order(table, self.cfg.min_hits)
            return table, order, n

        self._step = jax.jit(step)

    def update(self, detections: Sequence) -> List[HostTrack]:
        """detections: objects with .bbox/.class_id/.confidence (the
        reference Detection or host.HostDetection)."""
        import jax.numpy as jnp

        d = self._d_cap
        if len(detections) > d:
            raise ValueError(
                f"{len(detections)} detections > capacity {d}; raise "
                "max_detections at construction"
            )
        bbox = np.zeros((d, 4), np.float32)
        cid = np.zeros((d,), np.int32)
        conf = np.zeros((d,), np.float32)
        valid = np.zeros((d,), bool)
        for j, det in enumerate(detections):
            bbox[j] = det.bbox
            cid[j] = det.class_id
            conf[j] = det.confidence
            valid[j] = True
        dets = self._Detections(
            bbox=jnp.asarray(bbox),
            class_id=jnp.asarray(cid),
            confidence=jnp.asarray(conf),
            valid=jnp.asarray(valid),
        )
        self._table, order, n = self._step(self._table, dets)
        t = self._table
        g = lambda a: np.asarray(a)  # noqa: E731
        out = []
        for s in np.asarray(order)[: int(n)]:
            c = int(g(t.class_id)[s])
            vel_count = int(g(t.vel_count)[s])
            out.append(
                HostTrack(
                    track_id=int(g(t.track_id)[s]),
                    bbox=tuple(g(t.bbox)[s].tolist()),
                    class_id=c,
                    class_name=CLASS_NAMES[c],
                    confidence=float(g(t.confidence)[s]),
                    age=int(g(t.age)[s]),
                    hits=int(g(t.hits)[s]),
                    misses=int(g(t.misses)[s]),
                    trajectory=_unroll_ring(
                        g(t.trajectory)[s].reshape(-1, 2), int(g(t.traj_len)[s])
                    ),
                    velocity=(
                        tuple(g(t.velocity)[s].tolist()) if vel_count > 0 else None
                    ),
                )
            )
        return out

    def get_all_trajectories(self) -> Dict[int, List[Tuple[float, float]]]:
        """multi_object_tracker.py:243-249 (confirmed tracks only)."""
        from .tracking.tracker import confirmed_order

        order, n = confirmed_order(self._table, self.cfg.min_hits)
        t = self._table
        out = {}
        for s in np.asarray(order)[: int(n)]:
            out[int(np.asarray(t.track_id)[s])] = _unroll_ring(
                np.asarray(t.trajectory)[s].reshape(-1, 2),
                int(np.asarray(t.traj_len)[s]),
            )
        return out

    def reset(self) -> None:
        self._table = self._empty()


class VehicleStateEstimator:
    """Per-frame facade over estimation/ego.py (vehicle_state.py:33-257)."""

    def __init__(
        self,
        dt: float = 0.033,
        process_noise: float = 0.1,
        measurement_noise: float = 1.0,
    ):
        import jax

        from .estimation.ego import estimator_step
        from .ops.kalman import make_constant_accel_model
        from .types import KalmanState

        self.cfg = DEFAULT_CONFIG.estimator.__class__(
            dt=dt, process_noise=process_noise, measurement_noise=measurement_noise
        )
        model = make_constant_accel_model(
            dt, process_noise, measurement_noise, self.cfg.accel_noise_scale
        )
        self._initial = lambda: KalmanState.initial(self.cfg.initial_covariance)
        self._ks = self._initial()
        self._history = EgoStateHistory()

        def step(ks, z, has):
            return estimator_step(ks, model, z, has, self.cfg)

        self._step = jax.jit(step)

    def _run(self, measurement, has: bool) -> HostVehicleState:
        import jax.numpy as jnp

        z = jnp.asarray(
            np.zeros(4, np.float32) if measurement is None else measurement,
            jnp.float32,
        )
        self._ks, vs = self._step(self._ks, z, jnp.asarray(has))
        host = HostVehicleState(
            **{
                k: float(np.asarray(getattr(vs, k)))
                for k in (
                    "x", "y", "vx", "vy", "heading", "speed", "acceleration",
                    "yaw_rate", "timestamp", "pos_uncertainty", "vel_uncertainty",
                )
            }
        )
        self._history.append(host)
        return host

    def step(self, measurement=None) -> HostVehicleState:
        """predict + optional update (vehicle_state.py:139-156)."""
        return self._run(measurement, measurement is not None)

    def predict(self) -> HostVehicleState:
        return self._run(None, False)

    # History getters (vehicle_state.py:200-240).
    def get_state_history(self, n: Optional[int] = None):
        return self._history.get_state_history(n)

    def get_trajectory(self) -> np.ndarray:
        return self._history.get_trajectory()

    def get_velocity_history(self) -> np.ndarray:
        return self._history.get_velocity_history()

    def get_speed_history(self):
        return self._history.get_speed_history()

    def get_heading_history(self):
        return self._history.get_heading_history()

    def set_initial_state(self, x=0.0, y=0.0, vx=0.0, vy=0.0) -> None:
        """vehicle_state.py:242-248."""
        import jax.numpy as jnp

        ks = self._initial()
        self._ks = dataclasses.replace(
            ks, x=jnp.asarray([x, y, vx, vy, 0.0, 0.0], jnp.float32)
        )

    def reset(self) -> None:
        self._ks = self._initial()
        self._history.reset()


class MotionPlanner:
    """Per-frame facade over planning/planner.py (motion_planner.py:56-303)."""

    def __init__(
        self,
        planning_horizon: float = 5.0,
        dt: float = 0.1,
        num_samples: int = 7,
    ):
        import jax

        from .planning.planner import plan

        self.cfg = DEFAULT_CONFIG.planner.__class__(
            planning_horizon=planning_horizon, dt=dt, num_samples=num_samples
        )
        O = self.cfg.max_obstacles

        def run(current, obstacles, obstacles_valid):
            return plan(
                current,
                self.cfg,
                obstacles=obstacles,
                obstacles_valid=obstacles_valid,
            )

        self._run = jax.jit(run)
        self._O = O

    def plan(
        self,
        current_state,
        obstacles: Optional[Sequence[Tuple[float, float, float]]] = None,
    ) -> Tuple[HostTrajectory, List[HostTrajectory]]:
        """current_state: anything with .x/.y/.heading/.speed
        (HostVehicleState or the reference VehicleState).  obstacles:
        (x, y, radius) tuples (motion_planner.py:264-303)."""
        import jax.numpy as jnp

        cur = jnp.asarray(
            [current_state.x, current_state.y, current_state.heading,
             current_state.speed],
            jnp.float32,
        )
        obstacles = list(obstacles or [])
        if len(obstacles) > self._O:
            # Fail loudly like MultiObjectTracker.update's capacity check:
            # silently dropping obstacles could plan through one.
            raise ValueError(
                f"{len(obstacles)} obstacles > capacity {self._O}; raise "
                "PlannerConfig.max_obstacles at construction"
            )
        obs = np.zeros((self._O, 3), np.float32)
        val = np.zeros((self._O,), bool)
        for j, (x, y, r) in enumerate(obstacles):
            obs[j] = (x, y, r)
            val[j] = True
        pr = self._run(cur, jnp.asarray(obs), jnp.asarray(val))

        costs = np.asarray(pr.costs)
        positions = np.asarray(pr.positions)
        velocities = np.asarray(pr.velocities)
        lat = np.asarray(pr.lateral_offsets)
        order = np.asarray(pr.order)
        candidates = [
            HostTrajectory(
                positions=positions[c],
                velocities=velocities[c],
                cost=float(costs[c]),
                trajectory_type=trajectory_type_of(float(lat[c])),
            )
            for c in order
        ]
        return candidates[0], candidates

    def reset(self) -> None:  # motion_planner.py:372-374 (stateless)
        pass


class AutoTagger(_BaseAutoTagger):
    """Per-frame `tag_frame` facade over the device rule engines
    (auto_tagger.py:112-208), on top of the aggregation/search/export
    surface the base class already provides.

    ``tag_frame(frame, detections, tracks, lanes, vehicle_state)`` runs
    the scene/maneuver/interaction classifiers on device for one frame,
    appends a FrameTags record, and returns it — the reference signature
    exactly.  ``frame`` may be None (no visual features, like the fused
    pipeline's detections mode); ``lanes`` is the (left, right) LaneLine
    pair from `LaneDetector.detect` or None.
    """

    def __init__(self, video_path: str = "unknown", fps: float = 30.0, cfg=None):
        super().__init__(video_path=video_path, fps=fps)
        from .types import TaggingState

        self.cfg = cfg or DEFAULT_CONFIG
        tg = self.cfg.tagging
        self._t_cap = self.cfg.tracker.max_tracks
        self._initial = lambda: TaggingState.initial(
            tg.scene_smoothing_window, tg.maneuver_history, self._t_cap,
            interaction_history=tg.interaction_history,
        )
        self._state = self._initial()
        self._slots: Dict[int, int] = {}  # track_id -> stable slot
        self._steps: Dict[Tuple[bool, bool], object] = {}
        self._feat_fn = None

    def _tagging_step(self, has_lanes: bool, has_feats: bool):
        import jax

        key = (has_lanes, has_feats)
        if key not in self._steps:
            from .tagging.rules import make_tagging_step

            step = make_tagging_step(self.cfg)

            def run(state, dets, table, confirmed, n, vstate, lane_obs, feats):
                return step(
                    state,
                    dets=dets,
                    table=table,
                    confirmed=confirmed,
                    n_confirmed=n,
                    vstate=vstate,
                    lane_obs=lane_obs if has_lanes else None,
                    frame_feats=feats if has_feats else None,
                )

            self._steps[key] = jax.jit(run, static_argnums=())
        return self._steps[key]

    def _frame_features(self, frame):
        import jax

        if self._feat_fn is None:
            from .ops.image import bgr_to_gray_u8
            from .perception.lanes import make_scene_features

            feats = make_scene_features(self.cfg)

            def fn(f):
                return feats(f, bgr_to_gray_u8(f))

            self._feat_fn = jax.jit(fn)
        import jax.numpy as jnp

        return self._feat_fn(jnp.asarray(np.asarray(frame).astype(np.int32)))

    def _build_tables(self, detections, tracks):
        import jax.numpy as jnp

        from .types import Detections, TrackTable

        d = self.cfg.detector.max_detections
        bbox = np.zeros((d, 4), np.float32)
        cid = np.zeros((d,), np.int32)
        conf = np.zeros((d,), np.float32)
        valid = np.zeros((d,), bool)
        for j, det in enumerate(detections[:d]):
            bbox[j] = det.bbox
            cid[j] = det.class_id
            conf[j] = det.confidence
            valid[j] = True
        dets = Detections(
            bbox=jnp.asarray(bbox),
            class_id=jnp.asarray(cid),
            confidence=jnp.asarray(conf),
            valid=jnp.asarray(valid),
        )

        # Stable slot assignment so the interaction history rings
        # (TaggingState.int_centers, keyed by slot + track id) persist.
        T = self._t_cap
        live_ids = {t.track_id for t in tracks}
        self._slots = {i: s for i, s in self._slots.items() if i in live_ids}
        used = set(self._slots.values())
        for t in tracks:
            if t.track_id not in self._slots:
                s = next((i for i in range(T) if i not in used), None)
                if s is None:
                    raise ValueError(
                        f"{len(tracks)} live tracks exceed the tagging slot "
                        f"capacity {T} (cfg.tracker.max_tracks); construct "
                        "AutoTagger with a cfg whose tracker.max_tracks "
                        "matches the paired MultiObjectTracker"
                    )
                self._slots[t.track_id] = s
                used.add(s)

        tid = np.zeros((T,), np.int32)
        tb = np.zeros((T, 4), np.float32)
        tc = np.zeros((T,), np.int32)
        tcf = np.zeros((T,), np.float32)
        age = np.zeros((T,), np.int32)
        hits = np.zeros((T,), np.int32)
        miss = np.zeros((T,), np.int32)
        vel = np.zeros((T, 2), np.float32)
        vcnt = np.zeros((T,), np.int32)
        L = self.cfg.tracker.trajectory_length
        for t in tracks:
            s = self._slots[t.track_id]
            tid[s] = t.track_id
            tb[s] = t.bbox
            tc[s] = t.class_id
            tcf[s] = t.confidence
            age[s] = t.age
            hits[s] = max(t.hits, self.cfg.tracker.min_hits)
            miss[s] = t.misses
            if t.velocity is not None:
                vel[s] = t.velocity
                vcnt[s] = 1
        table = TrackTable(
            track_id=jnp.asarray(tid),
            bbox=jnp.asarray(tb),
            class_id=jnp.asarray(tc),
            confidence=jnp.asarray(tcf),
            age=jnp.asarray(age),
            hits=jnp.asarray(hits),
            misses=jnp.asarray(miss),
            trajectory=jnp.zeros((T, 2 * L), jnp.float32),
            traj_len=jnp.zeros((T,), jnp.int32),
            velocity=jnp.asarray(vel),
            vel_count=jnp.asarray(vcnt),
            next_id=jnp.asarray(max([t.track_id for t in tracks], default=0) + 1,
                                jnp.int32),
        )
        order = np.argsort(np.where(tid > 0, tid, np.iinfo(np.int32).max)).astype(
            np.int32
        )
        return dets, table, jnp.asarray(order), jnp.asarray(len(tracks), jnp.int32)

    def tag_frame(self, frame, detections, tracks, lanes, vehicle_state):
        import jax
        import jax.numpy as jnp

        from .types import LaneObservation, VehicleState

        dets, table, order, n = self._build_tables(detections or [], tracks or [])

        vs = VehicleState(
            **{
                k: jnp.asarray(getattr(vehicle_state, k), jnp.float32)
                for k in (
                    "x", "y", "vx", "vy", "heading", "speed", "acceleration",
                    "yaw_rate", "timestamp", "pos_uncertainty", "vel_uncertainty",
                )
            }
        )

        has_lanes = lanes is not None and any(l is not None for l in lanes)
        lane_obs = None
        if has_lanes:
            left, right = lanes
            z = jnp.zeros((3,), jnp.float32)
            lf = jnp.asarray(left.polynomial, jnp.float32) if left is not None else z
            rf = jnp.asarray(right.polynomial, jnp.float32) if right is not None else z
            both = left is not None and right is not None
            h = float(self.cfg.frame_height)
            if both:
                lane_center = (
                    float(np.trunc(np.polyval(np.asarray(lf), h)))
                    + float(np.trunc(np.polyval(np.asarray(rf), h)))
                ) / 2.0
                offset = self.cfg.frame_width / 2.0 - lane_center
            else:
                offset = 0.0
            lane_obs = LaneObservation(
                left_fit=lf,
                right_fit=rf,
                left_found=jnp.asarray(left is not None),
                right_found=jnp.asarray(right is not None),
                left_confidence=jnp.asarray(
                    left.confidence if left is not None else 0.0, jnp.float32
                ),
                right_confidence=jnp.asarray(
                    right.confidence if right is not None else 0.0, jnp.float32
                ),
                offset_px=jnp.asarray(offset, jnp.float32),
                has_offset=jnp.asarray(both),
            )

        has_feats = frame is not None
        feats = self._frame_features(frame) if has_feats else None

        step = self._tagging_step(has_lanes, has_feats)
        self._state, tags = step(
            self._state, dets, table, order, n, vs, lane_obs, feats
        )
        host_tags = jax.tree_util.tree_map(lambda x: np.asarray(x)[None], tags)
        self.ingest_device_tags(host_tags, 1)
        return self.frame_tags[-1]

    def reset(self) -> None:
        super().reset()
        self._state = self._initial()
        self._slots = {}


class SimulatedVehicleMotion:
    """Ground-truth + noisy-measurement ego simulator
    (vehicle_state.py:260-330)."""

    def __init__(self, dt: float = 0.033, seed: Optional[int] = 0):
        self.dt = dt
        if seed is not None:
            np.random.seed(seed)
        self._x = 0.0
        self._y = 0.0
        self._time = 0.0
        # Reference initial state (vehicle_state.py:271-277): speed 10 m/s,
        # heading 0 — get_ground_truth recomputes velocity from these, so a
        # fresh/reset simulator reports (0, 0, 10, 0), not zeros.
        self._speed = 10.0
        self._heading = 0.0

    def step(self) -> np.ndarray:
        """Advance one tick; returns the noisy (x, y, vx, vy) measurement."""
        self._time += self.dt
        self._speed = 10 + 3 * np.sin(self._time * 0.2)
        self._heading = (
            0.1 * np.sin(self._time * 0.3) + 0.05 * np.sin(self._time * 0.7)
        )
        vx = self._speed * np.cos(self._heading)
        vy = self._speed * np.sin(self._heading)
        self._x += vx * self.dt
        self._y += vy * self.dt
        return np.asarray(
            [
                self._x + np.random.normal(0, 0.5),
                self._y + np.random.normal(0, 0.5),
                vx + np.random.normal(0, 0.2),
                vy + np.random.normal(0, 0.2),
            ]
        )

    def get_ground_truth(self) -> np.ndarray:
        # Recomputed from current speed/heading like the reference
        # (vehicle_state.py:317-321) — (0, 0, 10, 0) before the first step.
        vx = self._speed * np.cos(self._heading)
        vy = self._speed * np.sin(self._heading)
        return np.asarray([self._x, self._y, vx, vy])

    def reset(self) -> None:
        self._x = self._y = self._time = 0.0
        self._speed = 10.0
        self._heading = 0.0
