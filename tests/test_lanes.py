"""Lane detection: deterministic Hough + polyfit vs ground-truth geometry."""

import cv2
import jax.numpy as jnp
import numpy as np

from multimodal_autonomous_driving_perception_and_planning_tpu import DEFAULT_CONFIG
from multimodal_autonomous_driving_perception_and_planning_tpu.data.frames import (
    SyntheticRoadGenerator,
)
from multimodal_autonomous_driving_perception_and_planning_tpu.ops.hough import (
    hough_segments,
)
from multimodal_autonomous_driving_perception_and_planning_tpu.perception.lanes import (
    make_lane_step,
)
from multimodal_autonomous_driving_perception_and_planning_tpu.types import LaneState


def test_hough_finds_a_drawn_line():
    img = np.zeros((480, 640), np.uint8)
    cv2.line(img, (100, 400), (300, 100), 255, 1)
    hl = hough_segments(jnp.asarray(img > 0), vote_threshold=50, min_line_length=50.0)
    valid = np.asarray(hl.valid)
    assert valid.any()
    seg = np.asarray(hl.segments)[np.argmax(np.asarray(hl.votes) * valid)]
    # Endpoints lie near the drawn segment's ends (either orientation).
    ends = {tuple(seg[:2]), tuple(seg[2:])}
    for want in ((100, 400), (300, 100)):
        assert min(
            np.hypot(e[0] - want[0], e[1] - want[1]) for e in ends
        ) < 6.0, (seg, want)


def test_hough_one_segment_per_physical_line():
    """Vote-tie plateaus and distinct peaks resolving to the same support
    must not emit duplicate segments: one 20-px line used to come out as 4
    identical segments (plateau keep-all + no dedup), inflating max_lines
    usage and the scene classifier's num_long_lines count."""
    edges = np.zeros((60, 80), bool)
    edges[30, 20:40] = True
    hl = hough_segments(
        jnp.asarray(edges), vote_threshold=5, min_line_length=10,
        num_thetas=180, max_lines=8, edge_capacity=256,
    )
    valid = np.asarray(hl.valid)
    assert valid.sum() == 1, np.asarray(hl.segments)[valid]
    seg = np.asarray(hl.segments)[valid][0]
    np.testing.assert_allclose(seg, [20.0, 30.0, 39.0, 30.0], atol=1.5)


def test_hough_overflow_flag():
    """Pool truncation is detectable: a pathological low-threshold dense
    edge field sets ``overflow``; normal lane scenes do not."""
    img = np.zeros((480, 640), np.uint8)
    cv2.line(img, (100, 400), (300, 100), 255, 1)
    hl = hough_segments(jnp.asarray(img > 0), vote_threshold=50, min_line_length=50.0)
    assert not bool(hl.overflow)

    # Checkerboard edges at vote_threshold=1: thousands of simultaneous
    # 1-vote peaks blow past the 256-entry pool.
    rng = np.random.default_rng(0)
    noise = rng.random((480, 640)) > 0.5
    hl2 = hough_segments(
        jnp.asarray(noise), vote_threshold=1, min_line_length=1.0
    )
    assert bool(hl2.overflow)


def test_lane_step_recovers_ground_truth_lanes():
    gen = SyntheticRoadGenerator()
    frame = gen.generate_frame_with_vehicles()
    cfg = DEFAULT_CONFIG
    step = make_lane_step(cfg)
    state, obs, feats = step(LaneState.initial(), jnp.asarray(frame))

    assert bool(obs.left_found) and bool(obs.right_found)
    h = cfg.frame_height
    # Hough endpoints cluster at the segment extremes (y ~= h and ~= 0.6h), so
    # the quadratic is only constrained there — exactly like the reference,
    # whose np.polyfit over HoughLinesP endpoints has the same support.
    for side, fit in (("left", np.asarray(obs.left_fit)), ("right", np.asarray(obs.right_fit))):
        for y in (h * 0.99, h * 0.62):
            got_x = fit[0] * y * y + fit[1] * y + fit[2]
            want_x = gen.lane_x_at(side, y)
            assert abs(got_x - want_x) < 15.0, (side, y, got_x, want_x)

    # Offset: the camera is centered between the lanes -> near zero.
    assert bool(obs.has_offset)
    assert abs(float(obs.offset_px)) < 12.0

    # Frame features are sane.
    assert 0.0 <= float(feats["center_edge_density"]) <= 1.0
    assert float(feats["brightness"]) > 30.0
    assert float(feats["green_ratio"]) > 0.05  # grass is visible


def test_lane_step_ema_smoothing():
    gen = SyntheticRoadGenerator()
    cfg = DEFAULT_CONFIG
    step = make_lane_step(cfg)
    state = LaneState.initial()
    f1 = jnp.asarray(gen.generate_frame_with_vehicles())
    state, obs1, _ = step(state, f1)
    f2 = jnp.asarray(gen.generate_frame_with_vehicles())
    state2, obs2, _ = step(state, f2)
    # Second-frame fit must be the EMA blend: close to the first fit.
    d = np.abs(np.asarray(obs2.left_fit) - np.asarray(obs1.left_fit))
    raw_step = make_lane_step(cfg)
    _, obs2_raw, _ = raw_step(LaneState.initial(), f2)
    d_raw = np.abs(np.asarray(obs2_raw.left_fit) - np.asarray(obs1.left_fit))
    assert (d <= d_raw + 1e-6).all()


def test_lane_step_no_lanes_in_blank_frame():
    cfg = DEFAULT_CONFIG
    step = make_lane_step(cfg)
    blank = jnp.zeros((cfg.frame_height, cfg.frame_width, 3), jnp.int32)
    state, obs, _ = step(LaneState.initial(), blank)
    assert not bool(obs.left_found) and not bool(obs.right_found)
    assert not bool(state.left_valid)

def test_edge_capacity_and_row_range():
    """Smaller edge capacity + ROI row restriction must not change the
    result when the edge set fits; overflow must be flagged when it
    doesn't (silent-truncation guard on the capacity knobs)."""
    import jax

    img = np.zeros((480, 640), np.uint8)
    cv2.line(img, (100, 400), (300, 300), 255, 1)
    cv2.line(img, (400, 300), (550, 420), 255, 1)
    edges = jnp.asarray(img > 0)  # all edge pixels live in rows [288, 480)

    def run(**kw):
        return jax.tree_util.tree_map(
            np.asarray,
            hough_segments(edges, vote_threshold=30, min_line_length=30.0, **kw),
        )

    base = run(edge_capacity=8192)
    small = run(edge_capacity=1024)
    banded = run(edge_capacity=1024, row_range=(288, 480))
    assert not base.edges_overflow and not small.edges_overflow
    assert not banded.edges_overflow
    for a in ("segments", "valid", "votes", "length"):
        np.testing.assert_array_equal(getattr(small, a), getattr(base, a))
        np.testing.assert_array_equal(getattr(banded, a), getattr(base, a))

    # Dense noise overflows a small capacity and says so.
    rng = np.random.default_rng(1)
    noisy = jnp.asarray(rng.random((480, 640)) > 0.5)
    hl = hough_segments(noisy, vote_threshold=50, min_line_length=50.0,
                        edge_capacity=1024)
    assert bool(hl.edges_overflow)


def test_reduced_scene_pass_tag_equivalent():
    """The default reduced scene-feature pass (2x downsample + feature-only
    Hough, config.py LaneConfig) must produce the same *thresholded*
    classifier inputs — and therefore the same road-type tags — as the
    full-resolution reference-style pass over the synthetic road stream.
    Parity for the scene classifier is defined at the tag level
    (scene_classifier.py:145-207 consumes booleans), not at the edge map.
    """
    import jax
    import numpy as np

    from multimodal_autonomous_driving_perception_and_planning_tpu import (
        DEFAULT_CONFIG,
        initial_state,
        make_sequence_runner,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.data.frames import (
        SyntheticRoadGenerator,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.data.synthetic import (
        ego_motion_stream,
        simulated_detection_stream,
    )

    n = 40
    base = DEFAULT_CONFIG.replace(use_frames=True, enable_tagging=True)
    assert base.lanes.scene_downsample == 2 and not base.lanes.scene_refine
    full_lanes = base.lanes.__class__(
        **{**base.lanes.__dict__, "scene_downsample": 1, "scene_refine": True}
    )
    full = base.replace(lanes=full_lanes)

    gen = SyntheticRoadGenerator(base.frame_width, base.frame_height)
    frames = gen.generate_frames(n)
    dets = simulated_detection_stream(n)
    ego = ego_motion_stream(n, seed=0)
    inputs = {k: jnp.asarray(v) for k, v in dets.items()}
    inputs["ego_measurement"] = jnp.asarray(ego, jnp.float32)
    inputs["frame"] = jnp.asarray(np.ascontiguousarray(frames, np.uint8))

    outs = {}
    for name, cfg in (("reduced", base), ("full", full)):
        run = make_sequence_runner(cfg, donate=False)
        _, o = run(initial_state(cfg), inputs)
        outs[name] = jax.tree_util.tree_map(np.asarray, o)

    r, fl = outs["reduced"]["tags"], outs["full"]["tags"]
    # Road type (and its smoothing history) sees only thresholded features.
    np.testing.assert_array_equal(r["road_type"], fl["road_type"])
    np.testing.assert_array_equal(r["road_type_raw"], fl["road_type_raw"])
    np.testing.assert_allclose(
        r["road_type_confidence"], fl["road_type_confidence"], atol=1e-6
    )
    # Conditions come from full-resolution brightness/Laplacian — exact.
    for k in ("cond_night", "cond_day", "cond_congested", "cond_clear", "cond_fog"):
        np.testing.assert_array_equal(r[k], fl[k], err_msg=k)
    # Lane fits are untouched by the scene pass.
    np.testing.assert_array_equal(
        outs["reduced"]["lane_obs"].left_fit, outs["full"]["lane_obs"].left_fit
    )


def test_lane_step_single_sided_lane():
    """Only a left-side line in view: the left/right separation (slope sign +
    midpoint side, lane_detector.py:105-134) must report left_found without
    right_found, fit the drawn line, and leave has_offset off (the offset
    needs both lanes, lane_detector.py:253-272)."""
    cfg = DEFAULT_CONFIG
    frame = np.zeros((cfg.frame_height, cfg.frame_width, 3), np.uint8)
    # Negative slope, midpoint left of center, inside the ROI trapezoid.
    cv2.line(frame, (160, 470), (280, 295), (255, 255, 255), 3)
    step = make_lane_step(cfg)
    state, obs, _ = step(LaneState.initial(), jnp.asarray(frame))

    assert bool(obs.left_found) and not bool(obs.right_found)
    assert not bool(obs.has_offset)
    fit = np.asarray(obs.left_fit)
    # The drawn segment: x as a function of y along (160,470)-(280,295).
    for y in (460.0, 310.0):
        want_x = 160 + (280 - 160) * (470 - y) / (470 - 295)
        got_x = fit[0] * y * y + fit[1] * y + fit[2]
        assert abs(got_x - want_x) < 10.0, (y, got_x, want_x)
    # The EMA carry holds only the left side.
    assert bool(state.left_valid) and not bool(state.right_valid)


def test_single_short_segment_fit_is_stable():
    """Regression (round-5 review): with the plain y/h-scaled basis, a
    single 50 px segment (legal: hough_min_line_length=50) produced an
    f32 Gram whose Cramer solve returned coefficients ~1e5 px off while
    lstsq stayed stable.  The per-fit centered+scaled basis must track
    the float64 least-squares solution inside the support band."""
    import jax

    from multimodal_autonomous_driving_perception_and_planning_tpu.perception.lanes import (
        _separate_and_fit,
    )

    for seg in (
        [100.0, 415.8, 147.4, 400.0],  # 50 px, slope -1/3 -> left
        [100.0, 377.0, 242.0, 330.0],  # 150 px
    ):
        lines = np.zeros((64, 4), np.float32)
        valid = np.zeros(64, bool)
        lines[0] = seg
        valid[0] = True
        (lf, lok, _), _ = jax.jit(
            lambda l, v: _separate_and_fit(l, v, 640, 480)
        )(jnp.asarray(lines), jnp.asarray(valid))
        assert bool(lok)

        t = np.linspace(0, 1, 8)
        sx = (seg[0] + (seg[2] - seg[0]) * t).astype(np.float64)
        sy = (seg[1] + (seg[3] - seg[1]) * t).astype(np.float64)
        A = np.stack([sy * sy, sy, np.ones_like(sy)], -1)
        ref, _, _, _ = np.linalg.lstsq(A, sx, rcond=None)
        for yv in (sy.min(), sy.mean(), sy.max()):
            got = float(lf[0]) * yv * yv + float(lf[1]) * yv + float(lf[2])
            want = ref[0] * yv * yv + ref[1] * yv + ref[2]
            assert abs(got - want) < 0.1, (seg, yv, got, want)
