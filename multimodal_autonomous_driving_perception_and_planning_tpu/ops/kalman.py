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


def _solve_spd4(S: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve S X = B for SPD 4x4 S via a fully unrolled Cholesky.

    ``jnp.linalg.solve`` lowers to a general pivoted LU — a heavyweight
    library routine that dominates the per-frame Kalman cost on TPU.  The
    innovation covariance S = H P H^T + R is symmetric positive definite,
    so an unrolled Cholesky factor + two triangular solves compile to ~40
    scalar VPU ops with no control flow.
    """
    l11 = jnp.sqrt(S[0, 0])
    l21 = S[1, 0] / l11
    l31 = S[2, 0] / l11
    l41 = S[3, 0] / l11
    l22 = jnp.sqrt(S[1, 1] - l21 * l21)
    l32 = (S[2, 1] - l31 * l21) / l22
    l42 = (S[3, 1] - l41 * l21) / l22
    l33 = jnp.sqrt(S[2, 2] - l31 * l31 - l32 * l32)
    l43 = (S[3, 2] - l41 * l31 - l42 * l32) / l33
    l44 = jnp.sqrt(S[3, 3] - l41 * l41 - l42 * l42 - l43 * l43)

    # Forward substitution L Y = B (rows of Y are (n,) vectors).
    y1 = B[0] / l11
    y2 = (B[1] - l21 * y1) / l22
    y3 = (B[2] - l31 * y1 - l32 * y2) / l33
    y4 = (B[3] - l41 * y1 - l42 * y2 - l43 * y3) / l44
    # Back substitution L^T X = Y.
    x4 = y4 / l44
    x3 = (y3 - l43 * x4) / l33
    x2 = (y2 - l32 * x3 - l42 * x4) / l22
    x1 = (y1 - l21 * x2 - l31 * x3 - l41 * x4) / l11
    return jnp.stack([x1, x2, x3, x4])


def kalman_update(
    model: KalmanModel, x: jnp.ndarray, P: jnp.ndarray, z: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Joseph-form measurement update (filterpy-compatible)."""
    with jax.default_matmul_precision("float32"):
        H = jnp.asarray(model.H, P.dtype)
        R = jnp.asarray(model.R, P.dtype)
        y = z - H @ x
        PHT = P @ H.T
        S = H @ PHT + R
        if S.shape[0] == 4:
            K = _solve_spd4(S, PHT.T).T  # K = PHT S^-1, no explicit inverse
        else:  # generic measurement dim: fall back to the library solve
            K = jnp.linalg.solve(S.T, PHT.T).T
        x = x + K @ y
        I_KH = jnp.eye(P.shape[0], dtype=P.dtype) - K @ H
        P = I_KH @ P @ I_KH.T + K @ R @ K.T
    return x, P
