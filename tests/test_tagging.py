"""Device tagging rules vs the reference-semantics oracle.

The full pipeline (tagging enabled, no frames) runs over the synthetic
sequence; the oracle's three rule engines are driven with the *same* inputs
(device detections, device track snapshots, device vehicle states, identical
default visual features), isolating the rules logic for exact comparison.
"""

import jax.numpy as jnp
import numpy as np

from multimodal_autonomous_driving_perception_and_planning_tpu import (
    DEFAULT_CONFIG,
    initial_state,
    make_sequence_runner,
)
from multimodal_autonomous_driving_perception_and_planning_tpu.data.synthetic import (
    ego_motion_stream,
    simulated_detection_stream,
)
from oracle import (
    INTERACTIONS,
    OracleInteractionDetector,
    OracleManeuverDetector,
    OracleSceneClassifier,
)

# The device defaults used when no frame is supplied (tagging/rules.py).
NO_FRAME_FEATS = dict(
    center_edge_density=0.0,
    num_long_lines=0,
    avg_line_length=0.0,
    green_ratio=0.0,
    brightness=128.0,
    laplacian_var=1000.0,
)


def run_device(num_frames):
    cfg = DEFAULT_CONFIG.replace(use_frames=False, enable_tagging=True)
    dets = simulated_detection_stream(num_frames)
    ego = ego_motion_stream(num_frames, seed=0)
    inputs = {
        "bbox": jnp.asarray(dets["bbox"]),
        "class_id": jnp.asarray(dets["class_id"]),
        "confidence": jnp.asarray(dets["confidence"]),
        "valid": jnp.asarray(dets["valid"]),
        "ego_measurement": jnp.asarray(ego, jnp.float32),
    }
    run = make_sequence_runner(cfg, donate=False)
    _, outs = run(initial_state(cfg), inputs)
    return cfg, dets, outs


def device_confirmed_tracks(outs, f):
    """Reconstruct the confirmed-track list (id order) from device outputs."""
    order = np.asarray(outs["confirmed_order"])[f]
    n = int(np.asarray(outs["num_confirmed"])[f])
    tracks = []
    for s in order[:n]:
        vel_count = int(np.asarray(outs["track_vel_count"])[f, s])
        tracks.append(
            dict(
                track_id=int(np.asarray(outs["track_id"])[f, s]),
                bbox=tuple(np.asarray(outs["track_bbox"])[f, s].tolist()),
                class_id=int(np.asarray(outs["track_class_id"])[f, s]),
                confidence=float(np.asarray(outs["track_confidence"])[f, s]),
                velocity=(
                    tuple(np.asarray(outs["track_velocity"])[f, s].tolist())
                    if vel_count > 0
                    else None
                ),
            )
        )
    return tracks


def test_tagging_matches_oracle_150_frames():
    num_frames = 150
    cfg, dets, outs = run_device(num_frames)
    tags = outs["tags"]
    vs = outs["vehicle_state"]

    scene = OracleSceneClassifier()
    maneuver = OracleManeuverDetector()
    interaction = OracleInteractionDetector(
        frame_shape=(cfg.frame_height, cfg.frame_width)
    )

    for f in range(num_frames):
        nd = int(dets["valid"][f].sum())
        det_classes = dets["class_id"][f][:nd].tolist()
        det_confs = dets["confidence"][f][:nd].tolist()

        want_rt, _ = scene.classify(NO_FRAME_FEATS, det_classes, det_confs, False)
        got_rt = int(np.asarray(tags["road_type"])[f])
        assert got_rt == want_rt, (f, got_rt, want_rt)

        state = {
            k: float(np.asarray(getattr(vs, k))[f])
            for k in ("speed", "heading", "acceleration", "yaw_rate", "x", "y")
        }
        w_lat, w_latc, w_lon, w_lonc, w_turn, w_turnc = maneuver.detect(state, None)
        assert int(np.asarray(tags["lateral"])[f]) == w_lat, f
        assert int(np.asarray(tags["longitudinal"])[f]) == w_lon, f
        assert int(np.asarray(tags["turning"])[f]) == w_turn, f
        np.testing.assert_allclose(
            float(np.asarray(tags["lateral_confidence"])[f]), w_latc, atol=1e-3
        )
        np.testing.assert_allclose(
            float(np.asarray(tags["longitudinal_confidence"])[f]), w_lonc, atol=1e-3
        )
        np.testing.assert_allclose(
            float(np.asarray(tags["turning_confidence"])[f]), w_turnc, atol=1e-3
        )

        tracks = device_confirmed_tracks(outs, f)
        want = interaction.detect(tracks, state["speed"])

        got_counts = [
            int(np.asarray(tags["pedestrian_count"])[f]),
            int(np.asarray(tags["cyclist_count"])[f]),
            int(np.asarray(tags["vehicle_count"])[f]),
        ]
        assert got_counts == want["counts"], (f, got_counts, want["counts"])

        got_primary = int(np.asarray(tags["primary_interaction"])[f])
        assert got_primary == want["primary"], (f, got_primary, want["primary"])

        got_overall = int(np.asarray(tags["overall_risk"])[f])
        assert got_overall == want["overall"], (f, got_overall, want["overall"])

        if tracks:
            np.testing.assert_allclose(
                float(np.asarray(tags["closest_agent_distance"])[f]),
                want["min_dist"],
                atol=1e-3,
            )

        # Present mask vs oracle (conf > 0.5).
        want_present = {
            INTERACTIONS.index(i["type"]) for i in want["interactions"] if i["conf"] > 0.5
        }
        got_present = set(np.flatnonzero(np.asarray(tags["interaction_present"])[f]))
        assert got_present == want_present, (f, got_present, want_present)


def test_timestamps_follow_frame_counter():
    _, _, outs = run_device(10)
    ts = np.asarray(outs["tags"]["timestamp"])
    np.testing.assert_allclose(ts, np.arange(10) / 30.0, atol=1e-6)


# ---------------------------------------------------------------------------
# Extreme-maneuver stream: every rule-engine branch, device vs oracle
# ---------------------------------------------------------------------------


def _extreme_ego(T, dt=1.0 / 30.0):
    """Phased ego stream engineered to fire every maneuver branch: cruise,
    hard brake to stopped, accelerate into a u-turn, sustained curve, and
    two gentle lane-change drifts (left then right)."""
    speed = np.zeros(T)
    head = np.zeros(T)
    h105 = h135 = h160 = 0.0
    for f in range(T):
        if f < 30:
            speed[f], head[f] = 12.0, 0.0
        elif f < 60:
            speed[f], head[f] = 12.0 * (1 - (f - 30) / 30.0), 0.0  # -12 m/s^2
        elif f < 80:
            speed[f], head[f] = 0.0, 0.0  # stopped
        elif f < 105:
            speed[f] = 10.0
            head[f] = np.deg2rad(10.0) * max(0, f - 82)  # 300 deg/s: u-turn
        elif f < 135:
            speed[f] = 10.0
            head[f] = h105 - np.deg2rad(2.0) * (f - 105)  # sustained curve
        elif f < 160:
            speed[f] = 10.0
            head[f] = h135 + np.deg2rad(0.3) * (f - 135)  # drift left
        else:
            speed[f] = 10.0
            head[f] = h160 - np.deg2rad(0.3) * (f - 160)  # drift right
        if f == 104:
            h105 = head[f]
        if f == 134:
            h135 = head[f]
        if f == 159:
            h160 = head[f]
    vx = speed * np.cos(head)
    vy = speed * np.sin(head)
    x = np.concatenate([[0.0], np.cumsum(vx)[:-1] * dt])
    y = np.concatenate([[0.0], np.cumsum(vy)[:-1] * dt])
    return np.stack([x, y, vx, vy], axis=1).astype(np.float32)


def test_extreme_maneuvers_match_oracle_all_branches():
    """The default ego stream is gentle — it never reaches hard_braking,
    stopped, any turning branch, or a lane change, so those branches of the
    maneuver engine (maneuver_detector.py:162-268 semantics) were compared
    against the oracle only implicitly (never taken).  This stream takes
    every branch of all three maneuver channels and must match the oracle
    frame-for-frame; the interaction/risk channels are compared on the same
    stream (the stopped phase exercises low relative-speed geometry)."""
    num_frames = 185
    cfg = DEFAULT_CONFIG.replace(use_frames=False, enable_tagging=True)
    dets = simulated_detection_stream(num_frames)
    ego = _extreme_ego(num_frames)
    inputs = {
        "bbox": jnp.asarray(dets["bbox"]),
        "class_id": jnp.asarray(dets["class_id"]),
        "confidence": jnp.asarray(dets["confidence"]),
        "valid": jnp.asarray(dets["valid"]),
        "ego_measurement": jnp.asarray(ego),
    }
    run = make_sequence_runner(cfg, donate=False)
    _, outs = run(initial_state(cfg), inputs)
    tags = outs["tags"]
    vs = outs["vehicle_state"]

    maneuver = OracleManeuverDetector()
    interaction = OracleInteractionDetector(
        frame_shape=(cfg.frame_height, cfg.frame_width)
    )
    for f in range(num_frames):
        state = {
            k: float(np.asarray(getattr(vs, k))[f])
            for k in ("speed", "heading", "acceleration", "yaw_rate", "x", "y")
        }
        w_lat, w_latc, w_lon, w_lonc, w_turn, w_turnc = maneuver.detect(state, None)
        assert int(np.asarray(tags["lateral"])[f]) == w_lat, f
        assert int(np.asarray(tags["longitudinal"])[f]) == w_lon, f
        assert int(np.asarray(tags["turning"])[f]) == w_turn, f
        np.testing.assert_allclose(
            float(np.asarray(tags["turning_confidence"])[f]), w_turnc, atol=1e-3
        )

        tracks = device_confirmed_tracks(outs, f)
        want = interaction.detect(tracks, state["speed"])
        assert int(np.asarray(tags["primary_interaction"])[f]) == want["primary"], f
        assert int(np.asarray(tags["overall_risk"])[f]) == want["overall"], f

    # Branch-coverage guarantee: every label of every channel was taken.
    from multimodal_autonomous_driving_perception_and_planning_tpu.tagging.rules import (
        LATERAL,
        LONGITUDINAL,
        TURNING,
    )

    for name, enum in (
        ("lateral", LATERAL),
        ("longitudinal", LONGITUDINAL),
        ("turning", TURNING),
    ):
        seen = set(np.asarray(tags[name]).astype(int).tolist())
        assert seen == set(range(len(enum))), (name, [enum[i] for i in sorted(seen)])


def test_staged_interactions_match_oracle_rare_branches():
    """near_miss, pedestrian_crossing/waiting, cyclist_nearby, and the full
    risk ladder never occur on the simulated stream (its boxes sit at
    mid-frame distances), so those interaction-engine branches
    (interaction_detector.py:268-398) were never compared device-vs-oracle.
    A staged detection script fires each one — ego stationary for the
    graded risks (a moving ego trips TTC-critical for any close object),
    then moving for the TTC path — and every frame must match the oracle.

    Scenario (640x480; distances via the monocular heuristic
    interaction_detector.py:224-247): a lone cyclist (MEDIUM), a pedestrian
    waiting off-center (LOW), the same pedestrian crossing center (HIGH),
    a car being followed, a huge near-field box (near_miss, CRITICAL), and
    a followed car under a 10 m/s ego (TTC < 1.5 s, CRITICAL)."""
    T, CAP = 100, 8
    bbox = np.zeros((T, CAP, 4), np.float32)
    cls = np.zeros((T, CAP), np.int32)
    conf = np.zeros((T, CAP), np.float32)
    valid = np.zeros((T, CAP), bool)

    def put(f, slot, cx, y2, w, h, c):
        bbox[f, slot] = [cx - w / 2, y2 - h, cx + w / 2, y2]
        cls[f, slot] = c
        conf[f, slot] = 0.9
        valid[f, slot] = True

    for f in range(3, 19):
        put(f, 1, 500, 400, 40, 60, 3)  # cyclist alone -> MEDIUM
    for f in range(19, 32):
        put(f, 0, 100, 460, 40, 90, 2)  # pedestrian waiting (off-center)
    for f in range(32, 46):
        put(f, 0, 320, 460, 40, 90, 2)  # pedestrian crossing -> HIGH
    for f in range(46, 59):
        put(f, 2, 320, 300, 60, 70, 0)  # following car (stationary ego)
    for f in range(59, 68):
        put(f, 3, 320, 480, 200, 390, 0)  # near-field box -> near_miss
    for f in range(72, 100):
        put(f, 4, 320, 300, 60, 70, 0)  # followed car, moving ego -> TTC

    ego = np.zeros((T, 4), np.float32)
    x = 0.0
    for f in range(T):
        v = 10.0 if f >= 70 else 0.0
        x += v / 30.0
        ego[f] = [x, 0.0, v, 0.0]

    cfg = DEFAULT_CONFIG.replace(use_frames=False, enable_tagging=True)
    inputs = {
        "bbox": jnp.asarray(bbox),
        "class_id": jnp.asarray(cls),
        "confidence": jnp.asarray(conf),
        "valid": jnp.asarray(valid),
        "ego_measurement": jnp.asarray(ego),
    }
    run = make_sequence_runner(cfg, donate=False)
    _, outs = run(initial_state(cfg), inputs)
    tags = outs["tags"]
    vs = outs["vehicle_state"]

    interaction = OracleInteractionDetector(
        frame_shape=(cfg.frame_height, cfg.frame_width)
    )
    for f in range(T):
        speed = float(np.asarray(vs.speed)[f])
        tracks = device_confirmed_tracks(outs, f)
        want = interaction.detect(tracks, speed)
        assert int(np.asarray(tags["primary_interaction"])[f]) == want["primary"], f
        assert int(np.asarray(tags["overall_risk"])[f]) == want["overall"], f
        want_present = {
            INTERACTIONS.index(i["type"])
            for i in want["interactions"]
            if i["conf"] > 0.5
        }
        got_present = set(np.flatnonzero(np.asarray(tags["interaction_present"])[f]))
        assert got_present == want_present, (f, got_present, want_present)
        if tracks:
            np.testing.assert_allclose(
                float(np.asarray(tags["closest_agent_distance"])[f]),
                want["min_dist"],
                atol=1e-3,
            )

    # Branch-coverage guarantees.
    fired = {
        INTERACTIONS[i]
        for i in np.flatnonzero(np.asarray(tags["interaction_present"]).any(axis=0))
    }
    assert fired >= {
        "following_vehicle",
        "pedestrian_crossing",
        "pedestrian_waiting",
        "cyclist_nearby",
        "near_miss",
    }, fired
    risks = set(np.asarray(tags["overall_risk"]).astype(int).tolist())
    assert risks == {0, 1, 2, 3}, risks  # low, medium, high, critical
    assert int(np.asarray(tags["has_min_ttc"]).sum()) > 0


def test_scene_feature_sweep_matches_oracle_all_road_types():
    """Every reachable road type (intersection, highway, urban — scored and
    default — residential) and every condition branch (night/day, fog,
    congested/clear) compared device-vs-oracle.  The pipeline streams only
    ever show one road regime, so the scored-heuristic branches
    (scene_classifier.py:145-207) and the majority-vote smoothing across
    regime CHANGES were never all taken.  Drives the tagging step directly
    in frames mode with crafted feature segments."""
    import jax

    from multimodal_autonomous_driving_perception_and_planning_tpu.tagging.rules import (
        make_tagging_step,
        ROAD_TYPES,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.types import (
        Detections,
        LaneObservation,
        TaggingState,
        TrackTable,
        VehicleState,
    )

    cfg = DEFAULT_CONFIG.replace(use_frames=True, enable_tagging=True)
    step = jax.jit(make_tagging_step(cfg, backend="cpu"))
    t_cap = cfg.tracker.max_tracks
    table = TrackTable.empty(t_cap, cfg.tracker.trajectory_length)

    D = 8

    def dets_for(classes):
        valid = np.zeros(D, bool)
        cls = np.zeros(D, np.int32)
        valid[: len(classes)] = True
        cls[: len(classes)] = classes
        bbox = np.zeros((D, 4), np.float32)
        bbox[: len(classes)] = [100, 100, 140, 140]
        return Detections(
            bbox=jnp.asarray(bbox),
            class_id=jnp.asarray(cls),
            confidence=jnp.asarray(np.where(valid, 0.9, 0.0), jnp.float32),
            valid=jnp.asarray(valid),
        )

    def lane(both):
        fit = jnp.asarray([0.0, 0.0, 200.0], jnp.float32)
        rfit = jnp.asarray([0.0, 0.0, 440.0], jnp.float32)
        return LaneObservation(
            left_fit=fit,
            right_fit=rfit,
            left_found=jnp.asarray(both),
            right_found=jnp.asarray(both),
            left_confidence=jnp.float32(0.8 if both else 0.0),
            right_confidence=jnp.float32(0.8 if both else 0.0),
            offset_px=jnp.float32(0.0),
            has_offset=jnp.asarray(both),
        )

    # (feats, det class ids, both_lanes, speed) per 12-frame segment.
    LOW = dict(center_edge_density=0.0, num_long_lines=0, avg_line_length=0.0,
               green_ratio=0.0, brightness=128.0, laplacian_var=1000.0)
    segments = [
        ({**LOW, "center_edge_density": 0.3}, [], False, 5.0),          # intersection
        ({**LOW, "num_long_lines": 8, "avg_line_length": 200.0}, [], True, 20.0),  # highway
        ({**LOW, "green_ratio": 0.3}, [0], False, 5.0),                 # residential
        ({**LOW, "brightness": 30.0, "laplacian_var": 50.0}, [], False, 1.0),  # urban default, night+fog+congested
        (LOW, [6, 0, 0, 0, 0], False, 5.0),                             # urban scored (traffic light + 4 cars)
    ]

    seen = set()
    for feats_np, classes, both, speed in segments:
        # Fresh smoothing state per segment: the reference's vote-mutation
        # quirk (scene_classifier.py:282-296, reproduced exactly — the
        # smoothed value overwrites the history entry) makes the majority
        # vote sticky, so a threaded state would lock segment 1's road type
        # forever; per-segment resets let every scored branch surface.
        state = TaggingState.initial(
            cfg.tagging.scene_smoothing_window, cfg.tagging.maneuver_history, t_cap
        )
        oracle = OracleSceneClassifier(window=cfg.tagging.scene_smoothing_window)
        for _ in range(12):
            feats = {
                k: (jnp.int32(v) if k == "num_long_lines" else jnp.float32(v))
                for k, v in feats_np.items()
            }
            vs = VehicleState(
                x=jnp.float32(0.0), y=jnp.float32(0.0), vx=jnp.float32(speed),
                vy=jnp.float32(0.0), heading=jnp.float32(0.0),
                speed=jnp.float32(speed), acceleration=jnp.float32(0.0),
                yaw_rate=jnp.float32(0.0), timestamp=jnp.float32(0.0),
                pos_uncertainty=jnp.float32(1.0), vel_uncertainty=jnp.float32(1.0),
            )
            state, tags = step(
                state, dets_for(classes), table, None, None, vs, lane(both), feats
            )
            want_rt, want_conf = oracle.classify(feats_np, classes, [0.9] * len(classes), both)
            got_rt = int(np.asarray(tags["road_type"]))
            assert got_rt == want_rt, (ROAD_TYPES[got_rt], ROAD_TYPES[want_rt])
            np.testing.assert_allclose(
                float(np.asarray(tags["road_type_confidence"])), want_conf, atol=1e-3
            )
            seen.add(got_rt)
            # Conditions: thresholds from scene_classifier.py:230-259.
            assert bool(np.asarray(tags["cond_night"])) == (feats_np["brightness"] < 60)
            assert bool(np.asarray(tags["cond_day"])) == (feats_np["brightness"] > 120)
            assert bool(np.asarray(tags["cond_fog"])) == (feats_np["laplacian_var"] < 100)
            assert bool(np.asarray(tags["cond_congested"])) == (speed < 2.0)
            assert bool(np.asarray(tags["cond_clear"])) == (speed > 15.0)

    want_types = {ROAD_TYPES.index(r) for r in ("intersection", "highway", "urban", "residential")}
    assert seen >= want_types, {ROAD_TYPES[i] for i in seen}
