"""Kalman filter predict/update as pure einsum steps.

TPU-native replacement for the reference's filterpy 6-state constant
acceleration filter (src/state_estimation/vehicle_state.py:68-106).  The
update uses the Joseph-form covariance update, matching filterpy's
``KalmanFilter.update`` numerically, so state trajectories track the CPU
reference to float precision.

Everything here is shape-(6,)/(6,6) math, trivially `vmap`-able into a
per-agent filter bank for the dense-traffic config (BASELINE.md config 4).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class KalmanModel(NamedTuple):
    F: jnp.ndarray  # (S, S) state transition
    H: jnp.ndarray  # (M, S) measurement
    Q: jnp.ndarray  # (S, S) process noise
    R: jnp.ndarray  # (M, M) measurement noise


def make_constant_accel_model(
    dt: float,
    process_noise: float = 0.1,
    measurement_noise: float = 1.0,
    accel_noise_scale: float = 10.0,
    dtype=jnp.float32,
) -> KalmanModel:
    """Constant-acceleration model over state [x, y, vx, vy, ax, ay] with
    measurements [x, y, vx, vy] (vehicle_state.py:75-98)."""
    h = 0.5 * dt * dt
    F = jnp.array(
        [
            [1, 0, dt, 0, h, 0],
            [0, 1, 0, dt, 0, h],
            [0, 0, 1, 0, dt, 0],
            [0, 0, 0, 1, 0, dt],
            [0, 0, 0, 0, 1, 0],
            [0, 0, 0, 0, 0, 1],
        ],
        dtype=dtype,
    )
    H = jnp.zeros((4, 6), dtype=dtype).at[jnp.arange(4), jnp.arange(4)].set(1)
    q = jnp.ones((6,), dtype=dtype) * process_noise
    q = q.at[4].mul(accel_noise_scale).at[5].mul(accel_noise_scale)
    Q = jnp.diag(q)
    R = jnp.eye(4, dtype=dtype) * measurement_noise
    return KalmanModel(F=F, H=H, Q=Q, R=R)


def kalman_predict(
    model: KalmanModel, x: jnp.ndarray, P: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x' = Fx,  P' = FPF^T + Q.

    Matmul precision is pinned to float32: these are tiny 6x6 products, and
    the TPU default (bf16 MXU passes) would cost ~1e-3 relative error per
    step — visible against the 1e-4 parity budget.
    """
    with jax.default_matmul_precision("float32"):
        x = model.F @ x
        P = model.F @ P @ model.F.T + model.Q
    return x, P


def kalman_update(
    model: KalmanModel, x: jnp.ndarray, P: jnp.ndarray, z: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Joseph-form measurement update (filterpy-compatible)."""
    with jax.default_matmul_precision("float32"):
        H = model.H
        y = z - H @ x
        PHT = P @ H.T
        S = H @ PHT + model.R
        K = jnp.linalg.solve(S.T, PHT.T).T  # K = PHT S^-1, no explicit inverse
        x = x + K @ y
        I_KH = jnp.eye(P.shape[0], dtype=P.dtype) - K @ H
        P = I_KH @ P @ I_KH.T + K @ model.R @ K.T
    return x, P
