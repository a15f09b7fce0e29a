"""Host stack: result extraction, viz rendering, AutoTagger aggregation,
and SQLite round-trip."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_autonomous_driving_perception_and_planning_tpu import (
    DEFAULT_CONFIG,
    initial_state,
    make_sequence_runner,
)
from multimodal_autonomous_driving_perception_and_planning_tpu.data.synthetic import (
    ego_motion_stream,
    simulated_detection_stream,
)
from multimodal_autonomous_driving_perception_and_planning_tpu.database import TagDatabase
from multimodal_autonomous_driving_perception_and_planning_tpu.host import extract_frame
from multimodal_autonomous_driving_perception_and_planning_tpu.tagging.auto_tagger import (
    AutoTagger,
)
from multimodal_autonomous_driving_perception_and_planning_tpu.viz import (
    BEVRenderer,
    OverlayRenderer,
    draw_detections,
    draw_lanes,
    draw_tracks,
)


@pytest.fixture(scope="module")
def pipeline_run():
    T = 40
    cfg = DEFAULT_CONFIG.replace(use_frames=False, enable_tagging=True)
    dets = simulated_detection_stream(T)
    ego = ego_motion_stream(T, seed=0)
    inputs = {k: jnp.asarray(v) for k, v in dets.items()}
    inputs["ego_measurement"] = jnp.asarray(ego, jnp.float32)
    run = make_sequence_runner(cfg, donate=False)
    _, outs = run(initial_state(cfg), inputs)
    return cfg, dets, outs, T


def test_extract_frame_records(pipeline_run):
    cfg, dets, outs, T = pipeline_run
    res = extract_frame(outs, dets, 20)
    assert len(res.detections) == int(dets["valid"][20].sum())
    assert all(t.hits >= cfg.tracker.min_hits for t in res.tracks)
    ids = [t.track_id for t in res.tracks]
    assert ids == sorted(ids)
    assert len(res.candidate_trajectories) == 21
    costs = [t.cost for t in res.candidate_trajectories]
    assert costs == sorted(costs)  # candidates come back cost-ordered
    assert res.optimal_trajectory.cost == costs[0]
    # Trajectory history capped at trajectory_length and ends at the bbox center.
    tr = res.tracks[0]
    assert len(tr.trajectory) <= cfg.tracker.trajectory_length
    np.testing.assert_allclose(tr.trajectory[-1], tr.center, atol=1e-4)


def test_viz_renders(pipeline_run):
    cfg, dets, outs, T = pipeline_run
    res = extract_frame(outs, dets, 30)
    frame = np.zeros((cfg.frame_height, cfg.frame_width, 3), np.uint8)
    img = draw_detections(frame, res.detections)
    img = draw_tracks(img, res.tracks)
    img = draw_lanes(img, np.asarray([0.0, 0.0, 100.0]), np.asarray([0.0, 0.0, 500.0]))
    assert img.shape == frame.shape and img.any()

    bev = BEVRenderer(cfg.bev)
    bev_img = bev.render(
        ego_state=res.vehicle_state,
        tracks=res.tracks,
        planned_trajectory=res.optimal_trajectory,
        candidate_trajectories=res.candidate_trajectories[:10],
        show_grid=True,
    )
    assert bev_img.shape == (600, 600, 3)

    ov = OverlayRenderer()
    img = ov.draw_info_panel(img, res.vehicle_state, fps=30.0, frame_num=30)
    img = ov.draw_detection_summary(img, res.detections)
    img = ov.draw_lane_offset_indicator(img, 12.0)
    img = ov.draw_tracking_stats(img, res.tracks)
    combined = ov.create_side_by_side(img, bev_img)
    assert combined.shape[0] == 600  # resized to the taller frame
    # World/pixel transforms round-trip.
    px, py = bev.world_to_pixel(5.0, 20.0)
    wx, wy = bev.pixel_to_world(px, py)
    assert abs(wx - 5.0) < 0.2 and abs(wy - 20.0) < 0.2


def test_auto_tagger_aggregation(pipeline_run):
    cfg, dets, outs, T = pipeline_run
    tagger = AutoTagger(video_path="synthetic", fps=30.0)
    tagger.ingest_device_tags(outs["tags"], T)
    assert tagger.frame_count == T

    stats = tagger.get_tag_statistics()
    assert stats["total_frames"] == T
    assert sum(stats["risk_distribution"].values()) == T
    assert stats["speed_stats"]["max"] >= stats["speed_stats"]["min"]

    # Every frame carries a road type + the three maneuvers.
    for ft in tagger.frame_tags:
        assert ft.scene["road_type"] in ft.all_tags
        assert ft.maneuver["lateral"] in ft.all_tags

    road = tagger.frame_tags[0].scene["road_type"]
    assert len(tagger.search_by_tag(road)) > 0
    assert tagger.search_by_tags([road, "nonexistent"], match_all=True) == []
    segs = tagger.get_event_segments(road, min_duration=2)
    assert all(b >= a + 1 for a, b in segs) or segs == []

    csv_rows = tagger.export_tags("csv")
    assert len(csv_rows) == T and "all_tags" in csv_rows[0]
    js = tagger.export_tags("json")
    assert '"session"' in js


def test_tag_database_roundtrip(pipeline_run, tmp_path):
    cfg, dets, outs, T = pipeline_run
    tagger = AutoTagger(video_path="synthetic", fps=30.0)
    tagger.ingest_device_tags(outs["tags"], T)
    tagger.finalize()

    db = TagDatabase(str(tmp_path / "tags.db"))
    n = db.save_all_tags(tagger)
    assert n == T

    stats = db.get_tag_statistics()
    assert stats["frame_count"] == T
    assert stats["session_count"] == 1
    assert stats["unique_tags"] == len(tagger.tag_counts)

    road = tagger.frame_tags[0].scene["road_type"]
    results = db.search_by_tag(road, limit=10)
    assert 0 < len(results) <= 10
    assert results[0].road_type == road

    multi = db.search_by_multiple_tags([road, tagger.frame_tags[0].maneuver["lateral"]])
    assert len(multi) > 0

    sessions = db.get_sessions()
    assert sessions[0]["session_id"] == tagger.session.session_id

    exported = db.export_session(tagger.session.session_id, "json")
    assert '"frames"' in exported

    db.delete_session(tagger.session.session_id)
    assert db.get_tag_statistics()["frame_count"] == 0
    db.close()


def test_high_risk_search_matches_tagger(pipeline_run, tmp_path):
    cfg, dets, outs, T = pipeline_run
    tagger = AutoTagger(video_path="synthetic")
    tagger.ingest_device_tags(outs["tags"], T)
    db = TagDatabase(str(tmp_path / "risk.db"))
    db.save_all_tags(tagger)
    want = len(tagger.get_high_risk_frames())
    got = len(db.search_high_risk(limit=10_000))
    assert got == want
    db.close()


def test_parity_helper_surface(pipeline_run):
    """The small reference API helpers: predict_next_position,
    get_all_trajectories, get_lane_center_offset, get_maneuver_summary,
    set_initial_state, generate_agent_trajectories."""
    import jax.numpy as jnp

    from multimodal_autonomous_driving_perception_and_planning_tpu.data.synthetic import (
        generate_agent_trajectories,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.estimation import (
        set_initial_state,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.host import (
        get_all_trajectories,
        get_lane_center_offset,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.tagging.auto_tagger import (
        get_maneuver_summary,
    )

    cfg, dets, outs, T = pipeline_run
    res = extract_frame(outs, dets, 20)

    # predict_next_position: center + velocity (multi_object_tracker.py:41-47).
    tr = res.tracks[0]
    nx, ny = tr.predict_next_position()
    if tr.velocity is not None:
        np.testing.assert_allclose(
            (nx, ny),
            (tr.center[0] + tr.velocity[0], tr.center[1] + tr.velocity[1]),
            atol=1e-6,
        )
    else:
        assert (nx, ny) == tr.center

    # get_all_trajectories mirrors :243-249 over confirmed tracks.
    trajs = get_all_trajectories(res.tracks)
    assert set(trajs) == {t.track_id for t in res.tracks}
    assert trajs[tr.track_id] == tr.trajectory

    # get_lane_center_offset (lane_detector.py:253-272).
    left = np.array([[100.0, 0.0], [110.0, 480.0]])
    right = np.array([[500.0, 0.0], [530.0, 480.0]])
    off = get_lane_center_offset(640, left, right)
    assert off == 640 / 2 - (110.0 + 530.0) / 2
    assert get_lane_center_offset(640, None, right) is None

    # get_maneuver_summary (maneuver_detector.py:270-299).
    vs = outs["vehicle_state"]
    speeds = np.asarray(vs.speed)
    accels = np.asarray(vs.acceleration)
    pos = np.stack([np.asarray(vs.x), np.asarray(vs.y)], axis=1)
    summary = get_maneuver_summary(speeds, accels, pos)
    np.testing.assert_allclose(
        summary["avg_speed_kmh"], np.mean(speeds[-30:]) * 3.6
    )
    np.testing.assert_allclose(
        summary["total_distance"],
        np.sum(np.linalg.norm(np.diff(pos[-30:], axis=0), axis=1)),
    )
    assert get_maneuver_summary(speeds[:4], accels[:4], pos[:4]) == {}

    # set_initial_state (vehicle_state.py:242-248).
    from multimodal_autonomous_driving_perception_and_planning_tpu import (
        initial_state,
    )

    st = initial_state(cfg)
    ks = set_initial_state(st.kalman, 1.0, 2.0, 3.0, 4.0)
    np.testing.assert_allclose(
        np.asarray(ks.x), [1.0, 2.0, 3.0, 4.0, 0.0, 0.0]
    )
    np.testing.assert_allclose(float(ks.prev_speed), 5.0)
    np.testing.assert_allclose(float(ks.prev_heading), np.arctan2(4.0, 3.0))

    # generate_agent_trajectories (synthetic_data bytecode :221-255).
    trajs = generate_agent_trajectories(3, 10, dt=0.1, seed=7)
    assert set(trajs) == {0, 1, 2}
    assert all(len(v) == 10 and len(v[0]) == 4 for v in trajs.values())
    # Euler-consistency: x[i+1] - x[i] == vx[i+1] * dt.
    a = np.asarray(trajs[0])
    np.testing.assert_allclose(a[1:, 0] - a[:-1, 0], a[1:, 2] * 0.1, atol=1e-9)


def test_ego_state_history_getters(pipeline_run):
    """EgoStateHistory mirrors vehicle_state.py:200-240 over stacked
    pipeline outputs, including the 1000-entry cap."""
    from multimodal_autonomous_driving_perception_and_planning_tpu.host import (
        EgoStateHistory,
    )

    cfg, dets, outs, T = pipeline_run
    h = EgoStateHistory()
    h.extend_from_outputs(outs["vehicle_state"])
    assert len(h.get_state_history()) == T
    assert len(h.get_state_history(5)) == 5
    traj = h.get_trajectory()
    assert traj.shape == (T, 2)
    np.testing.assert_allclose(traj[:, 0], np.asarray(outs["vehicle_state"].x), rtol=1e-6)
    times, speeds = h.get_speed_history()
    np.testing.assert_allclose(speeds, np.asarray(outs["vehicle_state"].speed), rtol=1e-6)
    assert times.shape == speeds.shape
    _, headings = h.get_heading_history()
    assert headings.shape == (T,)
    vel = h.get_velocity_history()
    assert vel.shape == (T, 2)

    # Cap behavior.
    small = EgoStateHistory(cap=10)
    small.extend_from_outputs(outs["vehicle_state"])
    assert len(small.get_state_history()) == 10
    np.testing.assert_allclose(
        small.get_trajectory()[-1], traj[-1], rtol=1e-6
    )
    small.reset()
    assert small.get_trajectory().size == 0
