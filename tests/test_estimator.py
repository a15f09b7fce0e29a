"""Ego Kalman estimator parity over full sequences."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_autonomous_driving_perception_and_planning_tpu.config import EstimatorConfig
from multimodal_autonomous_driving_perception_and_planning_tpu.data.synthetic import (
    ego_motion_stream,
    simulated_vehicle_motion_stream,
)
from multimodal_autonomous_driving_perception_and_planning_tpu.estimation.ego import estimator_step
from multimodal_autonomous_driving_perception_and_planning_tpu.ops.kalman import (
    make_constant_accel_model,
)
from multimodal_autonomous_driving_perception_and_planning_tpu.types import KalmanState
from oracle import OracleEstimator

FIELDS = (
    "x",
    "y",
    "vx",
    "vy",
    "heading",
    "speed",
    "acceleration",
    "yaw_rate",
    "pos_uncertainty",
    "vel_uncertainty",
)


def run_jax(measurements, cfg):
    model = make_constant_accel_model(
        cfg.dt, cfg.process_noise, cfg.measurement_noise, cfg.accel_noise_scale
    )

    def body(ks, z):
        ks, st = estimator_step(ks, model, z, jnp.asarray(True), cfg)
        return ks, st

    _, states = jax.lax.scan(
        body, KalmanState.initial(cfg.initial_covariance), jnp.asarray(measurements, jnp.float32)
    )
    return states


def test_estimator_matches_oracle_300_frames():
    cfg = EstimatorConfig()
    meas = ego_motion_stream(300, dt=1.0 / 30.0, seed=0)
    states = run_jax(meas, cfg)
    oracle = OracleEstimator(cfg.dt, cfg.process_noise, cfg.measurement_noise)
    for i in range(300):
        want = oracle.step(meas[i])
        for f in FIELDS:
            got = float(np.asarray(getattr(states, f))[i])
            assert abs(got - want[f]) < 1e-3, (i, f, got, want[f])


def test_estimator_tracks_simulated_motion_ground_truth():
    """KF should converge toward ground truth on the SimulatedVehicleMotion
    scenario (vehicle_state.py:260-330) — a functional sanity check."""
    cfg = EstimatorConfig()
    meas, truth = simulated_vehicle_motion_stream(400, dt=cfg.dt, seed=3)
    states = run_jax(meas, cfg)
    got_xy = np.stack([np.asarray(states.x), np.asarray(states.y)], axis=1)
    err = np.linalg.norm(got_xy[100:] - truth[100:, :2], axis=1)
    assert err.mean() < 1.0  # well under the 0.5 m measurement noise x2


def test_estimator_skip_measurement_branch():
    cfg = EstimatorConfig()
    model = make_constant_accel_model(cfg.dt, cfg.process_noise, cfg.measurement_noise)
    ks = KalmanState.initial()
    z = jnp.asarray([1.0, 1.0, 5.0, 0.0])
    ks, _ = estimator_step(ks, model, z, jnp.asarray(True), cfg)
    P_before = np.asarray(ks.P)
    ks2, st = estimator_step(ks, model, z, jnp.asarray(False), cfg)
    # With no measurement, covariance must grow (predict only).
    assert np.trace(np.asarray(ks2.P)) > np.trace(P_before)
    oracle = OracleEstimator(cfg.dt, cfg.process_noise, cfg.measurement_noise)
    oracle.step(np.asarray(z, np.float64))
    want = oracle.step(None)
    assert abs(float(st.speed) - want["speed"]) < 1e-3
