"""Ego vehicle state estimation as a pure scan step.

TPU-native rebuild of src/state_estimation/vehicle_state.py:33-257.

Subtle but load-bearing parity detail: the reference's ``step()`` calls
``predict()`` then ``update()``, and *both* internally call
``_extract_state`` which mutates ``prev_heading``/``prev_speed``
(:108-117, :119-137, :158-198).  The acceleration and yaw rate reported for
a frame are therefore finite differences against the *post-predict* values
of the same frame, not against the previous frame's output.  We replicate
that exactly: extract once after predict (discarding the state but keeping
the prev_* side effects), then extract again after update.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..config import EstimatorConfig
from ..ops.kalman import KalmanModel, kalman_predict, kalman_update
from ..types import KalmanState, VehicleState


def extract_state(
    x: jnp.ndarray,
    P: jnp.ndarray,
    time: jnp.ndarray,
    prev_heading: jnp.ndarray,
    prev_speed: jnp.ndarray,
    dt: float,
    speed_heading_hold: float = 0.1,
) -> Tuple[VehicleState, jnp.ndarray, jnp.ndarray]:
    """Derive (speed, heading, accel, yaw rate, uncertainties) from (x, P).

    Mirrors vehicle_state.py:158-198.  Returns the state plus the updated
    (prev_heading, prev_speed) memory.
    """
    px, py, vx, vy = x[0], x[1], x[2], x[3]
    speed = jnp.sqrt(vx * vx + vy * vy)
    heading = jnp.where(
        speed > speed_heading_hold, jnp.arctan2(vy, vx), prev_heading
    )
    acceleration = (speed - prev_speed) / dt if dt > 0 else jnp.zeros_like(speed)

    heading_diff = heading - prev_heading
    heading_diff = jnp.where(
        heading_diff > jnp.pi, heading_diff - 2 * jnp.pi, heading_diff
    )
    heading_diff = jnp.where(
        heading_diff < -jnp.pi, heading_diff + 2 * jnp.pi, heading_diff
    )
    yaw_rate = heading_diff / dt if dt > 0 else jnp.zeros_like(heading_diff)

    pos_unc = jnp.sqrt(P[0, 0] + P[1, 1])
    vel_unc = jnp.sqrt(P[2, 2] + P[3, 3])

    state = VehicleState(
        x=px,
        y=py,
        vx=vx,
        vy=vy,
        heading=heading,
        speed=speed,
        acceleration=acceleration,
        yaw_rate=yaw_rate,
        timestamp=time,
        pos_uncertainty=pos_unc,
        vel_uncertainty=vel_unc,
    )
    return state, heading, speed


def set_initial_state(
    ks: KalmanState,
    x: float,
    y: float,
    vx: float = 0.0,
    vy: float = 0.0,
    ax: float = 0.0,
    ay: float = 0.0,
) -> KalmanState:
    """Seed the filter at a known state (vehicle_state.py:242-248): sets the
    6-vector and primes prev_heading/prev_speed from the given velocity so
    the first frame's finite differences are taken against it."""
    x6 = jnp.asarray([x, y, vx, vy, ax, ay], ks.x.dtype)
    return KalmanState(
        x=x6,
        P=ks.P,
        time=ks.time,
        prev_heading=jnp.asarray(jnp.arctan2(vy, vx), ks.prev_heading.dtype),
        prev_speed=jnp.asarray(jnp.sqrt(vx * vx + vy * vy), ks.prev_speed.dtype),
    )


def estimator_step(
    ks: KalmanState,
    model: KalmanModel,
    measurement: jnp.ndarray,
    has_measurement,
    cfg: EstimatorConfig,
    backend: str = None,
) -> Tuple[KalmanState, VehicleState]:
    """predict + optional update, replicating vehicle_state.py:139-156.

    On TPU the whole step dispatches (at lowering time, `ops.dispatch`)
    to one fused Pallas kernel (`ops.kalman_pallas`) — ~30 tiny 6x6 XLA
    ops collapse into a single Mosaic program; the parity budget is
    unchanged (PARITY.md).  ``backend`` overrides the platform choice at
    trace time for oracle comparisons.

    Args:
      measurement: (4,) [x, y, vx, vy]; ignored when ``has_measurement`` is
        False (the reference's measurement-skip branch).
    """
    from ..ops.dispatch import kernel_or_xla

    return kernel_or_xla(
        lambda k, m, h: _estimator_step_fused(k, model, m, h, cfg),
        lambda k, m, h: _estimator_step_xla(k, model, m, h, cfg),
        ks,
        measurement,
        has_measurement,
        backend=backend,
    )


def _estimator_step_xla(
    ks: KalmanState,
    model: KalmanModel,
    measurement: jnp.ndarray,
    has_measurement,
    cfg: EstimatorConfig,
) -> Tuple[KalmanState, VehicleState]:
    """The XLA estimator step (CPU path and equivalence oracle)."""
    # predict() — advances time, extracts state for its prev_* side effects.
    x, P = kalman_predict(model, ks.x, ks.P)
    time = ks.time + cfg.dt
    _, prev_heading, prev_speed = extract_state(
        x, P, time, ks.prev_heading, ks.prev_speed, cfg.dt, cfg.speed_heading_hold
    )

    # update(z) — Joseph-form KF update, then the reported extraction.
    xu, Pu = kalman_update(model, x, P, measurement)
    x = jnp.where(has_measurement, xu, x)
    P = jnp.where(has_measurement, Pu, P)

    state, prev_heading, prev_speed = extract_state(
        x, P, time, prev_heading, prev_speed, cfg.dt, cfg.speed_heading_hold
    )
    new_ks = KalmanState(
        x=x, P=P, time=time, prev_heading=prev_heading, prev_speed=prev_speed
    )
    return new_ks, state


_FUSED_CACHE: dict = {}


def _estimator_step_fused(
    ks: KalmanState,
    model: KalmanModel,
    measurement: jnp.ndarray,
    has_measurement,
    cfg: EstimatorConfig,
    interpret: bool = False,
) -> Tuple[KalmanState, VehicleState]:
    """estimator_step via the single Pallas kernel (ops.kalman_pallas)."""
    from ..ops.kalman_pallas import make_fused_estimator_step

    # Key by matrix contents, not id(model): ids can be recycled after GC
    # and a stale entry would silently apply old baked F/Q/R constants.
    key = (
        tuple(np.asarray(m).tobytes() for m in (model.F, model.H, model.Q, model.R)),
        cfg.dt,
        cfg.speed_heading_hold,
        interpret,
    )
    if key not in _FUSED_CACHE:
        _FUSED_CACHE[key] = make_fused_estimator_step(
            model, cfg.dt, cfg.speed_heading_hold, interpret=interpret
        )
    x2, P2, s = _FUSED_CACHE[key](
        ks.x, ks.P, measurement, ks.time, ks.prev_heading, ks.prev_speed,
        has_measurement,
    )
    # Heading/yaw outside the kernel (Mosaic TC lowers no atan2): the
    # exact extract_state math over the kernel's velocity outputs.
    speed_p, speed = s[1], s[2]
    hold = cfg.speed_heading_hold
    heading_p = jnp.where(
        speed_p > hold, jnp.arctan2(s[8], s[7]), ks.prev_heading
    )
    heading = jnp.where(speed > hold, jnp.arctan2(s[6], s[5]), heading_p)
    hdiff = heading - heading_p
    hdiff = jnp.where(hdiff > jnp.pi, hdiff - 2 * jnp.pi, hdiff)
    hdiff = jnp.where(hdiff < -jnp.pi, hdiff + 2 * jnp.pi, hdiff)
    yaw = hdiff / cfg.dt if cfg.dt > 0 else jnp.zeros_like(hdiff)
    state = VehicleState(
        x=s[3], y=s[4], vx=s[5], vy=s[6], heading=heading, speed=speed,
        acceleration=s[9], yaw_rate=yaw, timestamp=s[0],
        pos_uncertainty=s[10], vel_uncertainty=s[11],
    )
    new_ks = KalmanState(
        x=x2, P=P2, time=s[0], prev_heading=heading, prev_speed=speed
    )
    return new_ks, state
