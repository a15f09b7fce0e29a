"""Non-default configs must trace and run.

Regression net for the "knob only works at its default" bug class: the
interaction_history ring was sized from maneuver_history, so any config
where the two differed crashed at trace time (fixed in types.py) — a knob
nobody varies in tests is a knob that silently rots.  Every sweep entry
changes capacities/windows away from their defaults and runs a short
sequence end-to-end; outputs just need finite shapes, not golden values.
"""

import dataclasses

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


def _run(cfg, num_frames=4, frames=None):
    dets = simulated_detection_stream(
        num_frames,
        height=cfg.frame_height,
        width=cfg.frame_width,
        capacity=cfg.detector.max_detections,
    )
    inputs = {k: jnp.asarray(v) for k, v in dets.items()}
    inputs["ego_measurement"] = jnp.asarray(
        ego_motion_stream(num_frames, seed=0), jnp.float32
    )
    if frames is not None:
        inputs["frame"] = jnp.asarray(frames)
    run = make_sequence_runner(cfg, donate=False)
    final, outs = run(initial_state(cfg), inputs)
    best = np.asarray(outs["plan_best"])
    assert best.shape == (num_frames,) and np.isfinite(best).all()
    return outs


def _replace(node, **kw):
    return dataclasses.replace(node, **kw)


SWEEP = [
    # tracker capacities / lifecycle knobs
    lambda c: c.replace(
        tracker=_replace(c.tracker, max_tracks=24, trajectory_length=7,
                         min_hits=1, max_age=2)
    ),
    # detection table capacity
    lambda c: c.replace(detector=_replace(c.detector, max_detections=9)),
    # tagging windows: interaction != maneuver (the fixed crash), odd scene
    # window, non-default fps
    lambda c: c.replace(
        tagging=_replace(c.tagging, interaction_history=12,
                         maneuver_history=18, scene_smoothing_window=3,
                         fps=25.0)
    ),
    # planner grid / capacities
    lambda c: c.replace(
        planner=_replace(c.planner, num_samples=5,
                         target_velocities=(9.0, 11.0), max_obstacles=4,
                         max_reference_points=16)
    ),
    # estimator timing / noise
    lambda c: c.replace(
        estimator=_replace(c.estimator, dt=0.04, process_noise=0.2,
                           measurement_noise=0.5)
    ),
]


@pytest.mark.parametrize("mutate", SWEEP, ids=[
    "tracker", "detector", "tagging", "planner", "estimator",
])
def test_detections_mode_nondefault_configs(mutate):
    cfg = mutate(DEFAULT_CONFIG.replace(use_frames=False, enable_tagging=True))
    _run(cfg)


def test_frames_mode_nondefault_configs():
    """Lane/scene knobs (pool caps, theta grid, ROI fractions, downsample)
    at non-default values through the full image stack."""
    from multimodal_autonomous_driving_perception_and_planning_tpu.data.frames import (
        SyntheticRoadGenerator,
    )

    h, w, t = 96, 128, 3
    cfg = DEFAULT_CONFIG.replace(
        use_frames=True,
        enable_tagging=True,
        frame_height=h,
        frame_width=w,
    )
    cfg = cfg.replace(
        lanes=_replace(
            cfg.lanes,
            num_thetas=90,
            max_lines=12,
            lane_edge_capacity=512,
            scene_edge_capacity=768,
            roi_top_y_frac=0.5,
            roi_bottom_frac=0.05,
            min_abs_slope=0.25,
            scene_downsample=1,
            scene_refine=True,
            num_lane_points=20,
        ),
        tagging=_replace(cfg.tagging, interaction_history=10),
    )
    frames = SyntheticRoadGenerator(width=w, height=h).generate_frames(t)
    outs = _run(cfg, num_frames=t, frames=np.ascontiguousarray(frames))
    assert "lane_obs" in outs
