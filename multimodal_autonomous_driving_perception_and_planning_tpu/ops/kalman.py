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
    F: "np.ndarray"  # (S, S) state transition (host constant; see below)
    H: "np.ndarray"  # (M, S) measurement
    Q: "np.ndarray"  # (S, S) process noise
    R: "np.ndarray"  # (M, M) measurement noise


def make_constant_accel_model(
    dt: float,
    process_noise: float = 0.1,
    measurement_noise: float = 1.0,
    accel_noise_scale: float = 10.0,
    dtype=jnp.float32,
) -> KalmanModel:
    """Constant-acceleration model over state [x, y, vx, vy, ax, ay] with
    measurements [x, y, vx, vy] (vehicle_state.py:75-98).

    Returns *host* (numpy) arrays on purpose: the model is closed over by
    jitted step functions, and a closure-captured device array makes every
    dispatch in the process take ~30 ms on tunnel-attached TPU runtimes
    (jit hoists it into a per-call transferred constant).  numpy constants
    bake into the HLO at trace time instead.
    """
    import numpy as np

    npdtype = np.dtype(jnp.dtype(dtype).name)
    h = 0.5 * dt * dt
    F = np.array(
        [
            [1, 0, dt, 0, h, 0],
            [0, 1, 0, dt, 0, h],
            [0, 0, 1, 0, dt, 0],
            [0, 0, 0, 1, 0, dt],
            [0, 0, 0, 0, 1, 0],
            [0, 0, 0, 0, 0, 1],
        ],
        dtype=npdtype,
    )
    H = np.zeros((4, 6), dtype=npdtype)
    H[np.arange(4), np.arange(4)] = 1
    q = np.ones((6,), dtype=npdtype) * process_noise
    q[4] *= accel_noise_scale
    q[5] *= accel_noise_scale
    Q = np.diag(q).astype(npdtype)
    R = (np.eye(4) * measurement_noise).astype(npdtype)
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
