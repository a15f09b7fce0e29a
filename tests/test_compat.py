"""Reference-named per-frame facades (compat.py) vs the fused runner."""

import numpy as np
import pytest
import jax.numpy as jnp

from multimodal_autonomous_driving_perception_and_planning_tpu import (
    DEFAULT_CONFIG,
    initial_state,
    make_sequence_runner,
)
from multimodal_autonomous_driving_perception_and_planning_tpu.compat import (
    LaneDetector,
    MotionPlanner,
    MultiObjectTracker,
    SimulatedVehicleMotion,
    VehicleStateEstimator,
)
from multimodal_autonomous_driving_perception_and_planning_tpu.data.synthetic import (
    ego_motion_stream,
    simulated_detection_stream,
    simulated_vehicle_motion_stream,
)
from multimodal_autonomous_driving_perception_and_planning_tpu.host import (
    HostDetection,
    CLASS_NAMES,
)

N = 40


def _stream_frames():
    dets = simulated_detection_stream(N)
    ego = ego_motion_stream(N, seed=0)
    return dets, ego


def test_per_frame_facades_match_fused_runner():
    """Driving compat classes one frame at a time reproduces the fused
    scan's tracks, ego states, and chosen plans exactly."""
    cfg = DEFAULT_CONFIG.replace(use_frames=False, enable_tagging=False)
    dets, ego = _stream_frames()
    inputs = {k: jnp.asarray(v) for k, v in dets.items()}
    inputs["ego_measurement"] = jnp.asarray(ego, jnp.float32)
    _, outs = make_sequence_runner(cfg, donate=False)(initial_state(cfg), inputs)

    tracker = MultiObjectTracker()
    estimator = VehicleStateEstimator()
    planner = MotionPlanner()

    for f in range(N):
        frame_dets = [
            HostDetection(
                bbox=tuple(dets["bbox"][f, j].tolist()),
                class_id=int(dets["class_id"][f, j]),
                class_name=CLASS_NAMES[int(dets["class_id"][f, j])],
                confidence=float(dets["confidence"][f, j]),
            )
            for j in np.flatnonzero(dets["valid"][f])
        ]
        tracks = tracker.update(frame_dets)
        vstate = estimator.step(ego[f])
        optimal, candidates = planner.plan(vstate)

        want_n = int(np.asarray(outs["num_confirmed"])[f])
        want_ids = [
            int(np.asarray(outs["track_id"])[f, s])
            for s in np.asarray(outs["confirmed_order"])[f][:want_n]
        ]
        assert [t.track_id for t in tracks] == want_ids, f
        np.testing.assert_allclose(
            vstate.speed, float(np.asarray(outs["vehicle_state"].speed)[f]),
            rtol=0, atol=0,
        )
        np.testing.assert_allclose(
            vstate.x, float(np.asarray(outs["vehicle_state"].x)[f]), rtol=0, atol=0
        )
        best = int(np.asarray(outs["plan_best"])[f])
        np.testing.assert_allclose(
            optimal.positions,
            np.asarray(outs["plan_positions"])[f, best],
            rtol=0, atol=0,
        )
        assert len(candidates) == 21

    # Trajectory bookkeeping mirrors the reference helpers.
    trajs = tracker.get_all_trajectories()
    assert set(trajs) == set(t.track_id for t in tracks)
    hist = estimator.get_trajectory()
    assert hist.shape == (N, 2)

    tracker.reset()
    assert tracker.update([]) == []


def test_lane_detector_facade_finds_lanes():
    from multimodal_autonomous_driving_perception_and_planning_tpu.data.frames import (
        SyntheticRoadGenerator,
    )

    cfg = DEFAULT_CONFIG
    gen = SyntheticRoadGenerator(cfg.frame_width, cfg.frame_height)
    det = LaneDetector()
    left = right = None
    for f in gen.generate_frames(3):
        left, right = det.detect(f)
    assert left is not None and right is not None
    assert left.side == "left" and right.side == "right"
    assert left.points.shape == (50, 2)
    h = cfg.frame_height
    for side, lane in (("left", left), ("right", right)):
        y = h * 0.8
        x = np.polyval(lane.polynomial, y)
        assert abs(x - gen.lane_x_at(side, y)) < 8.0, (side, x)
    off = det.get_lane_center_offset(cfg.frame_width, left, right)
    assert off is not None and abs(off) < 12.0
    assert det.get_lane_center_offset(cfg.frame_width, None, right) is None
    det.reset()


def test_simulated_vehicle_motion_matches_stream():
    sim = SimulatedVehicleMotion(dt=0.033, seed=0)
    got = np.stack([sim.step() for _ in range(25)])
    want, truth = simulated_vehicle_motion_stream(25, dt=0.033, seed=0)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)
    np.testing.assert_allclose(sim.get_ground_truth(), truth[-1], atol=1e-12)


def test_planner_obstacle_penalty_changes_choice():
    est = VehicleStateEstimator()
    vs = est.step(np.asarray([0.0, 0.0, 10.0, 0.0]))
    planner = MotionPlanner()
    free, _ = planner.plan(vs)
    # A wall of obstacles on the straight-ahead path forces a detour.
    blocked, _ = planner.plan(
        vs, obstacles=[(x, vs.y, 1.0) for x in range(5, 45, 5)]
    )
    assert blocked.cost > free.cost
    assert blocked.trajectory_type != "lane_keep" or blocked.cost > free.cost


def test_auto_tagger_facade_matches_fused_pipeline():
    """compat.AutoTagger.tag_frame (reference signature, per frame) must
    reproduce the fused pipeline's device tags over the synthetic stream —
    including the cross-frame smoothing/history state."""
    from multimodal_autonomous_driving_perception_and_planning_tpu.compat import (
        AutoTagger,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.host import (
        extract_frame,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.tagging.auto_tagger import (
        AutoTagger as BaseTagger,
    )

    cfg = DEFAULT_CONFIG.replace(use_frames=False, enable_tagging=True)
    dets, ego = _stream_frames()
    inputs = {k: jnp.asarray(v) for k, v in dets.items()}
    inputs["ego_measurement"] = jnp.asarray(ego, jnp.float32)
    _, outs = make_sequence_runner(cfg, donate=False)(initial_state(cfg), inputs)
    import jax

    outs = jax.tree_util.tree_map(np.asarray, outs)
    base = BaseTagger(video_path="synthetic", fps=30.0)
    base.ingest_device_tags(outs["tags"], N)

    facade = AutoTagger(video_path="synthetic", fps=30.0, cfg=cfg)
    for f in range(N):
        res = extract_frame(outs, dets, f)
        ft = facade.tag_frame(
            None,
            detections=res.detections,
            tracks=res.tracks,
            lanes=None,
            vehicle_state=res.vehicle_state,
        )
        want = base.frame_tags[f]
        assert sorted(ft.all_tags) == sorted(want.all_tags), (f, ft.all_tags, want.all_tags)
        # The interactions detail list is ordered by track-table slot — an
        # internal layout artifact that differs between the facade's slot
        # assignment and the tracker's — and host->device float round-trips
        # perturb derived floats at ~1e-7: compare structurally with approx
        # floats and order-insensitive interactions.
        def approx(a, b, path=""):
            if isinstance(a, dict):
                assert isinstance(b, dict) and a.keys() == b.keys(), (f, path)
                for k in a:
                    approx(a[k], b[k], f"{path}.{k}")
            elif isinstance(a, (list, tuple)):
                assert len(a) == len(b), (f, path)
                for j, (x, y) in enumerate(zip(a, b)):
                    approx(x, y, f"{path}[{j}]")
            elif isinstance(a, float) and isinstance(b, float):
                assert a == pytest.approx(b, rel=1e-4, abs=1e-4), (f, path, a, b)
            else:
                assert a == b, (f, path, a, b)

        def canon(i):
            i = dict(i)
            i["interactions"] = sorted(
                i["interactions"], key=lambda d: (d["type"], d["distance"])
            )
            return i

        approx(canon(ft.interaction), canon(want.interaction), "interaction")
        approx(ft.scene, want.scene, "scene")
        approx(ft.maneuver, want.maneuver, "maneuver")

    # The inherited aggregation surface agrees too.
    assert facade.get_tag_statistics()["total_frames"] == N
    assert [t.frame_idx for t in facade.get_high_risk_frames()] == [
        t.frame_idx for t in base.get_high_risk_frames()
    ]
    facade.reset()
    assert facade.frame_tags == []


def test_object_detector_reference_surface():
    """detector.py:39-60,171-222: class attrs + draw_detections method."""
    from multimodal_autonomous_driving_perception_and_planning_tpu.perception.detector import (
        ObjectDetector,
    )

    d = ObjectDetector()
    assert d.CLASSES[0] == "car" and d.CLASSES[2] == "pedestrian"
    assert d.CLASS_COLORS[0] == (0, 255, 0)
    frame = np.zeros((480, 640, 3), np.uint8)
    dets = d.detect(frame)
    assert 3 <= len(dets) <= 7  # detector.py:137
    out = d.draw_detections(frame, dets)
    assert out.shape == frame.shape and out.sum() > 0
    d.reset()
    assert d.frame_count == 0
