"""CPU parity oracle: a float64 numpy model of the reference pipeline.

This is an independent reimplementation of the observable semantics of the
reference stack (it does NOT import or copy /root/reference), used as the
ground truth for parity tests:

  * greedy IoU tracker        (src/tracking/multi_object_tracker.py:84-241)
  * 6-state const-accel KF    (src/state_estimation/vehicle_state.py:33-198,
                               filterpy predict/Joseph update)
  * quintic planner           (src/planning/motion_planner.py:126-303)

The JAX pipeline must match these trajectories (track ids, states, selected
plans) within the BASELINE.md tolerance of 1e-4.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# Tracker oracle
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class OTrack:
    track_id: int
    bbox: Tuple[float, float, float, float]
    class_id: int
    confidence: float
    age: int = 0
    hits: int = 1
    misses: int = 0
    trajectory: list = dataclasses.field(default_factory=list)
    velocities: list = dataclasses.field(default_factory=list)

    @property
    def center(self):
        x1, y1, x2, y2 = self.bbox
        return ((x1 + x2) / 2, (y1 + y2) / 2)


def _iou(b1, b2) -> float:
    x1 = max(b1[0], b2[0])
    y1 = max(b1[1], b2[1])
    x2 = min(b1[2], b2[2])
    y2 = min(b1[3], b2[3])
    if x2 <= x1 or y2 <= y1:
        return 0.0
    inter = (x2 - x1) * (y2 - y1)
    a1 = (b1[2] - b1[0]) * (b1[3] - b1[1])
    a2 = (b2[2] - b2[0]) * (b2[3] - b2[1])
    union = a1 + a2 - inter
    return inter / union if union > 0 else 0.0


class OracleTracker:
    """Greedy-IoU tracker with the reference's exact lifecycle rules."""

    def __init__(self, iou_threshold=0.3, max_age=30, min_hits=3, trajectory_length=50):
        self.iou_threshold = iou_threshold
        self.max_age = max_age
        self.min_hits = min_hits
        self.trajectory_length = trajectory_length
        self.tracks: Dict[int, OTrack] = {}
        self.next_id = 1

    def update(self, boxes, class_ids, confs) -> List[OTrack]:
        n = len(boxes)
        track_ids = list(self.tracks.keys())
        matched, used_t, used_d = [], set(), set()
        if n and track_ids:
            m = np.zeros((len(track_ids), n))
            for i, tid in enumerate(track_ids):
                for j in range(n):
                    m[i, j] = _iou(self.tracks[tid].bbox, boxes[j])
            while m.size:
                best = m.max()
                if best < self.iou_threshold:
                    break
                i, j = np.unravel_index(m.argmax(), m.shape)
                matched.append((track_ids[i], j))
                used_t.add(track_ids[i])
                used_d.add(j)
                m[i, :] = -1
                m[:, j] = -1

        for tid, j in matched:
            tr = self.tracks[tid]
            oc = tr.center
            nc = ((boxes[j][0] + boxes[j][2]) / 2, (boxes[j][1] + boxes[j][3]) / 2)
            tr.velocities.append((nc[0] - oc[0], nc[1] - oc[1]))
            tr.bbox = tuple(boxes[j])
            tr.confidence = confs[j]
            tr.age += 1
            tr.hits += 1
            tr.misses = 0
            tr.trajectory.append(nc)
            if len(tr.trajectory) > self.trajectory_length:
                tr.trajectory = tr.trajectory[-self.trajectory_length:]
                tr.velocities = tr.velocities[-self.trajectory_length:]

        for tid in track_ids:
            if tid not in used_t:
                self.tracks[tid].age += 1
                self.tracks[tid].misses += 1

        for j in range(n):
            if j not in used_d:
                c = ((boxes[j][0] + boxes[j][2]) / 2, (boxes[j][1] + boxes[j][3]) / 2)
                self.tracks[self.next_id] = OTrack(
                    track_id=self.next_id,
                    bbox=tuple(boxes[j]),
                    class_id=int(class_ids[j]),
                    confidence=float(confs[j]),
                    trajectory=[c],
                )
                self.next_id += 1

        for tid in [t for t, tr in self.tracks.items() if tr.misses > self.max_age]:
            del self.tracks[tid]

        return [t for t in self.tracks.values() if t.hits >= self.min_hits]


# ---------------------------------------------------------------------------
# Kalman oracle (filterpy-equivalent, float64)
# ---------------------------------------------------------------------------


class OracleEstimator:
    """Const-accel KF + the reference's derived-quantity bookkeeping,
    including the double _extract_state call per step."""

    def __init__(self, dt=0.033, process_noise=0.1, measurement_noise=1.0):
        self.dt = dt
        h = 0.5 * dt * dt
        self.F = np.array(
            [
                [1, 0, dt, 0, h, 0],
                [0, 1, 0, dt, 0, h],
                [0, 0, 1, 0, dt, 0],
                [0, 0, 0, 1, 0, dt],
                [0, 0, 0, 0, 1, 0],
                [0, 0, 0, 0, 0, 1],
            ]
        )
        self.H = np.zeros((4, 6))
        self.H[np.arange(4), np.arange(4)] = 1
        self.R = np.eye(4) * measurement_noise
        self.Q = np.eye(6) * process_noise
        self.Q[4, 4] *= 10
        self.Q[5, 5] *= 10
        self.P = np.eye(6) * 10.0
        self.x = np.zeros(6)
        self.time = 0.0
        self.prev_heading = 0.0
        self.prev_speed = 0.0

    def _extract(self):
        x, y, vx, vy = self.x[0], self.x[1], self.x[2], self.x[3]
        speed = float(np.hypot(vx, vy))
        heading = float(np.arctan2(vy, vx)) if speed > 0.1 else self.prev_heading
        accel = (speed - self.prev_speed) / self.dt
        hd = heading - self.prev_heading
        if hd > np.pi:
            hd -= 2 * np.pi
        elif hd < -np.pi:
            hd += 2 * np.pi
        yaw_rate = hd / self.dt
        state = dict(
            x=float(x),
            y=float(y),
            vx=float(vx),
            vy=float(vy),
            heading=heading,
            speed=speed,
            acceleration=accel,
            yaw_rate=yaw_rate,
            timestamp=self.time,
            pos_uncertainty=float(np.sqrt(self.P[0, 0] + self.P[1, 1])),
            vel_uncertainty=float(np.sqrt(self.P[2, 2] + self.P[3, 3])),
        )
        self.prev_heading = heading
        self.prev_speed = speed
        return state

    def step(self, z: Optional[np.ndarray]):
        # predict
        self.x = self.F @ self.x
        self.P = self.F @ self.P @ self.F.T + self.Q
        self.time += self.dt
        self._extract()  # side effects on prev_* only
        if z is not None:
            y = z - self.H @ self.x
            PHT = self.P @ self.H.T
            S = self.H @ PHT + self.R
            K = PHT @ np.linalg.inv(S)
            self.x = self.x + K @ y
            I_KH = np.eye(6) - K @ self.H
            self.P = I_KH @ self.P @ I_KH.T + K @ self.R @ K.T
        return self._extract()


# ---------------------------------------------------------------------------
# Planner oracle
# ---------------------------------------------------------------------------


def oracle_plan(
    current_state,
    horizon=5.0,
    dt=0.1,
    num_samples=7,
    target_velocities=(8.0, 10.0, 12.0),
    w_velocity=0.5,
    w_acceleration=0.3,
    w_curvature=0.4,
    w_lateral=1.0,
    reference_positions=None,
    obstacles=None,
):
    """All candidate trajectories + costs, in reference grid order."""
    x0, y0, heading0, v0 = current_state
    n = int(horizon / dt) + 1
    ts = np.linspace(0, horizon, n)
    results = []
    for lat_offset in np.linspace(-3.5, 3.5, num_samples):
        for tv in target_velocities:
            vel = np.zeros(n)
            s = np.zeros(n)
            for i, t in enumerate(ts):
                vel[i] = v0 + (tv - v0) * (1 - np.exp(-t))
                if i > 0:
                    s[i] = s[i - 1] + vel[i] * dt
            lat = np.zeros(n)
            for i, t in enumerate(ts):
                tau = np.clip(t / horizon, 0, 1)
                lat[i] = lat_offset * (10 * tau**3 - 15 * tau**4 + 6 * tau**5)
            xs = x0 + s * np.cos(heading0) + lat * np.cos(heading0 + np.pi / 2)
            ys = y0 + s * np.sin(heading0) + lat * np.sin(heading0 + np.pi / 2)
            heads = np.zeros(n)
            for i in range(n):
                if i < n - 1:
                    heads[i] = np.arctan2(ys[i + 1] - ys[i], xs[i + 1] - xs[i])
                else:
                    heads[i] = heads[i - 1]
            kappa = np.zeros(n)
            for i in range(1, n - 1):
                kappa[i] = (heads[i] - heads[i - 1]) / (vel[i] * dt + 1e-6)

            cost = 0.0
            if reference_positions is not None and len(reference_positions):
                rp = np.asarray(reference_positions)
                for i in range(n):
                    d = np.min(np.linalg.norm(rp - np.array([xs[i], ys[i]]), axis=1))
                    cost += w_lateral * d**2
            cost += w_velocity * np.sum((vel - 10.0) ** 2)
            for i in range(1, n):
                dti = ts[i] - ts[i - 1]
                if dti > 0:
                    cost += w_acceleration * ((vel[i] - vel[i - 1]) / dti) ** 2
            cost += w_curvature * np.sum(kappa**2)
            if obstacles:
                for ox, oy, r in obstacles:
                    for i in range(n):
                        d = np.hypot(xs[i] - ox, ys[i] - oy)
                        if d < r * 2:
                            cost += 1000 * (r * 2 - d)
                        elif d < r * 4:
                            cost += 10 / (d - r + 0.1)
            results.append(
                dict(
                    lat_offset=lat_offset,
                    target_velocity=tv,
                    x=xs,
                    y=ys,
                    heading=heads,
                    velocity=vel,
                    curvature=kappa,
                    cost=cost,
                )
            )
    order = sorted(range(len(results)), key=lambda i: results[i]["cost"])
    return results, order


# ---------------------------------------------------------------------------
# Tagging oracle (scene / maneuver / interaction rule engines)
# ---------------------------------------------------------------------------

ROAD_TYPES = ("unknown", "intersection", "highway", "urban", "residential", "parking")
LATERAL = ("lane_keeping", "lane_change_left", "lane_change_right", "swerving")
LONGITUDINAL = ("cruising", "accelerating", "braking", "hard_braking", "stopped")
TURNING = ("straight", "turning_left", "turning_right", "u_turn", "curving_left", "curving_right")
INTERACTIONS = (
    "no_interaction", "following_vehicle", "being_followed", "yielding",
    "vehicle_cut_in", "vehicle_cut_out", "pedestrian_crossing",
    "pedestrian_waiting", "cyclist_nearby", "near_miss", "merging",
    "passing", "being_passed",
)
RISKS = ("low", "medium", "high", "critical")
CLASS_NAMES = ("car", "truck", "pedestrian", "cyclist", "motorcycle", "bus",
               "traffic_light", "stop_sign")


class OracleSceneClassifier:
    """scene_classifier.py:91-298 over precomputed visual features."""

    def __init__(self, window=5):
        self.window = window
        self.history = []

    def classify(self, feats, det_classes, det_confs, both_lanes):
        scores = {rt: 0.0 for rt in ROAD_TYPES}
        if feats["center_edge_density"] > 0.15:
            scores["intersection"] += 0.4
        if feats["num_long_lines"] > 5 and feats["avg_line_length"] > 150:
            scores["highway"] += 0.5
        if len(det_classes):
            traffic = sum(1 for c in det_classes if CLASS_NAMES[c] in ("traffic_light", "stop_sign"))
            if traffic > 0:
                scores["intersection"] += 0.3
                scores["urban"] += 0.2
            veh = sum(1 for c in det_classes if CLASS_NAMES[c] in ("car", "truck", "bus"))
            if veh > 3:
                scores["urban"] += 0.3
                scores["highway"] += 0.2
            elif veh <= 1:
                scores["residential"] += 0.3
        if feats["green_ratio"] > 0.15:
            scores["residential"] += 0.3
        if both_lanes:
            scores["highway"] += 0.2
            scores["urban"] += 0.1
        total = sum(scores.values()) + 0.001
        scores = {k: v / total for k, v in scores.items()}
        best = max(scores, key=scores.get)
        conf = scores[best]
        if conf < 0.3:
            best, conf = "urban", 0.3

        self.history.append(best)
        if len(self.history) > self.window:
            self.history.pop(0)
        smoothed = best
        if len(self.history) >= 2:
            votes = {}
            for rt in self.history:
                votes[rt] = votes.get(rt, 0) + 1
            top = max(votes, key=votes.get)
            if votes[top] > len(self.history) // 2:
                smoothed = top
        # The reference's _smooth_tags mutates the history entry it just
        # appended (same SceneTags object), so later votes see the smoothed
        # value (scene_classifier.py:282-296).
        self.history[-1] = smoothed
        return ROAD_TYPES.index(smoothed), conf


class OracleManeuverDetector:
    """maneuver_detector.py:105-268."""

    def __init__(self):
        self.hist = []

    def detect(self, state, lane_offset):
        self.hist.append(dict(state))
        if len(self.hist) > 30:
            self.hist.pop(0)
        speed, accel = state["speed"], state["acceleration"]
        yaw = state["yaw_rate"]
        yaw_deg = np.degrees(yaw)

        # lateral
        lat, lat_c = "lane_keeping", 0.8
        done = False
        if len(self.hist) >= 10:
            recent = [s["yaw_rate"] for s in self.hist[-10:]]
            avg, std = np.mean(recent), np.std(recent)
            if std > 0.1:
                lat, lat_c, done = "swerving", min(0.9, std * 5), True
            else:
                avg_deg = np.degrees(avg)
                if avg_deg > 5.0:
                    lat, lat_c, done = "lane_change_left", min(0.9, abs(avg_deg) / 20), True
                elif avg_deg < -5.0:
                    lat, lat_c, done = "lane_change_right", min(0.9, abs(avg_deg) / 20), True
        if not done and lane_offset is not None and abs(lane_offset) > 0.5:
            lat, lat_c = ("lane_change_left", 0.6) if lane_offset > 0 else ("lane_change_right", 0.6)

        # longitudinal
        if speed < 0.5:
            lon, lon_c = "stopped", 0.95
        elif accel < -3.0:
            lon, lon_c = "hard_braking", min(0.95, abs(accel) / 5)
        elif accel < -1.0:
            lon, lon_c = "braking", min(0.9, abs(accel) / 3)
        elif accel > 1.0:
            lon, lon_c = "accelerating", min(0.9, accel / 3)
        else:
            lon, lon_c = "cruising", 0.8

        # turning
        if len(self.hist) < 15:
            turn, turn_c = "straight", 0.5
        else:
            hs = [s["heading"] for s in self.hist[-15:]]
            hc = np.degrees(hs[-1] - hs[0])
            while hc > 180:
                hc -= 360
            while hc < -180:
                hc += 360
            if abs(hc) > 120:
                turn, turn_c = "u_turn", 0.8
            elif hc > 60:
                turn, turn_c = "turning_left", min(0.9, hc / 90)
            elif hc < -60:
                turn, turn_c = "turning_right", min(0.9, abs(hc) / 90)
            elif hc > 15:
                turn, turn_c = "curving_left", min(0.8, hc / 45)
            elif hc < -15:
                turn, turn_c = "curving_right", min(0.8, abs(hc) / 45)
            elif abs(yaw_deg) > 15.0:
                turn, turn_c = ("curving_left", 0.6) if yaw_deg > 0 else ("curving_right", 0.6)
            else:
                turn, turn_c = "straight", 0.8
        return (
            LATERAL.index(lat), lat_c,
            LONGITUDINAL.index(lon), lon_c,
            TURNING.index(turn), turn_c,
        )


class OracleInteractionDetector:
    """interaction_detector.py:132-398, incl. the string-sort quirk."""

    def __init__(self, frame_shape=(480, 640)):
        self.h, self.w = frame_shape
        self.track_history = {}

    def _distance(self, bbox):
        x1, y1, x2, y2 = bbox
        bh = y2 - y1
        if bh <= 0:
            return 50.0
        ynorm = y2 / self.h
        base = 50.0 * (1 - ynorm) + 5.0
        size = 100.0 / (bh + 10)
        return max(2.0, min(100.0, (base + size) / 2))

    def detect(self, tracks, ego_speed):
        """tracks: list of dicts(track_id, bbox, class_id, confidence, velocity|None)."""
        out = dict(interactions=[], counts=[0, 0, 0], min_dist=float("inf"),
                   min_ttc=float("inf"), primary=-1, overall=0)
        if not tracks:
            return out
        for t in tracks:
            name = CLASS_NAMES[t["class_id"]]
            if name == "pedestrian":
                out["counts"][0] += 1
            elif name in ("cyclist", "bicycle"):
                out["counts"][1] += 1
            elif name in ("car", "truck", "bus", "motorcycle"):
                out["counts"][2] += 1

        inters = []
        for t in tracks:
            name = CLASS_NAMES[t["class_id"]]
            bbox = t["bbox"]
            dist = self._distance(bbox)
            out["min_dist"] = min(out["min_dist"], dist)
            vel = t["velocity"]
            rel = 0.0 if vel is None else ego_speed - vel[1]
            ttc = dist / rel if rel > 0.1 else None
            if ttc is not None and ttc > 0:
                out["min_ttc"] = min(out["min_ttc"], ttc)
            tid = t["track_id"]
            hist = self.track_history.setdefault(tid, [])
            cx = (bbox[0] + bbox[2]) / 2
            cy = (bbox[1] + bbox[3]) / 2
            hist.append((cx, cy))
            if len(hist) > 30:
                hist.pop(0)

            itype, conf, risk = None, 0.0, 0
            if dist < 3.0:
                itype, conf, risk = "near_miss", 0.9, 3
            elif name == "pedestrian" and dist < 10.0:
                if abs(cx - self.w / 2) < self.w / 4:
                    itype, conf, risk = "pedestrian_crossing", 0.8, 2 if dist < 8 else 1
                else:
                    itype, conf, risk = "pedestrian_waiting", 0.6, 0
            elif name in ("cyclist", "bicycle") and dist < 15:
                itype, conf, risk = "cyclist_nearby", 0.7, 1 if dist < 8 else 0
            elif name in ("car", "truck", "bus"):
                if self.w / 4 < cx < 3 * self.w / 4 and 5.0 < dist < 30.0:
                    risk = 0
                    if dist < 10:
                        risk = 1
                    if ttc and ttc < 3.0:
                        risk = 2
                    itype, conf = "following_vehicle", 0.75
                elif len(hist) >= 10:
                    sx, ex = hist[0][0], hist[-1][0]
                    if abs(ex - self.w / 2) < abs(sx - self.w / 2) and dist < 15.0:
                        itype, conf, risk = "vehicle_cut_in", 0.7, 1
            if itype:
                inters.append(dict(type=itype, conf=conf, risk=risk, tid=tid))

        out["interactions"] = inters
        if inters:
            ordered = sorted(
                inters, key=lambda i: (RISKS[i["risk"]], -i["conf"]), reverse=True
            )
            out["primary"] = INTERACTIONS.index(ordered[0]["type"])
            mt = out["min_ttc"]
            if mt and mt < 1.5:
                out["overall"] = 3
            else:
                out["overall"] = max(i["risk"] for i in inters)
        return out
