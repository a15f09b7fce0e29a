"""Opt-in per-agent Kalman smoothing bank (BASELINE config 4 wording).

The reference tracker has NO per-track filter — track velocity is a raw
frame diff (src/tracking/multi_object_tracker.py:180-205) — so this stage
is deliberately opt-in and parity-neutral: it post-processes the scanned
pipeline outputs without feeding back into tracking decisions.

TPU design: one constant-acceleration filter per track *slot*, all N slots
advanced as a single vmapped predict/update over the fixed-shape bank —
(N, 6) states and (N, 6, 6) covariances — inside a `lax.scan` over time.
At 64-128 slots the whole bank step is a handful of batched 6x6 einsums;
there is no per-track Python, matching the rest of the framework.

Slot lifecycle is derived from the scanned ``track_id`` stream:
  * id changed (birth / slot reuse) -> filter reset to the measurement;
  * same id, slot alive            -> predict + Joseph update;
  * slot free                      -> state carried (masked out of output).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PipelineConfig
from ..ops.kalman import kalman_predict, kalman_update, make_constant_accel_model


def make_kalman_bank(
    cfg: PipelineConfig,
    process_noise: float = 1.0,
    measurement_noise: float = 4.0,
    accel_noise_scale: float = 10.0,
    initial_covariance: float = 100.0,
):
    """Build ``smooth(outs) -> dict`` over scanned pipeline outputs.

    ``outs`` needs ``track_id`` (T, N), ``track_bbox`` (T, N, 4),
    ``track_velocity`` (T, N, 2), ``track_vel_count`` (T, N) — all present
    in `make_sequence_runner` outputs.  Returns per-frame smoothed
    ``positions`` (T, N, 2), ``velocities`` (T, N, 2), ``valid`` (T, N).

    Measurement noise defaults are in pixels: detection-box centers jitter
    by a few px frame to frame, which is exactly what the bank smooths.
    """
    # Track-space time unit is FRAMES: track velocities are raw per-frame
    # position diffs (multi_object_tracker.py:180-205), so dt = 1 frame —
    # not the estimator's wall-clock dt.
    model = make_constant_accel_model(
        1.0,
        process_noise=process_noise,
        measurement_noise=measurement_noise,
        accel_noise_scale=accel_noise_scale,
    )
    n = cfg.tracker.max_tracks
    p0 = float(initial_covariance)

    def slot_step(x, P, prev_id, tid, center, vel, vel_count):
        alive = tid > 0
        fresh = alive & (tid != prev_id)
        cont = alive & (tid == prev_id)

        # Velocity measurement: the raw frame diff; before the first diff
        # exists (vel_count == 0) measure the predicted velocity instead,
        # making the velocity residual zero (a position-only update for
        # the mean).
        xp, Pp = kalman_predict(model, x, P)
        has_vel = vel_count > 0
        z = jnp.concatenate(
            [center, jnp.where(has_vel, vel, xp[2:4])]
        )
        xu, Pu = kalman_update(model, xp, Pp, z)

        x_reset = jnp.concatenate([center, jnp.where(has_vel, vel, jnp.zeros(2)), jnp.zeros(2)])
        P_reset = jnp.eye(6) * p0

        x_new = jnp.where(fresh, x_reset, jnp.where(cont, xu, x))
        P_new = jnp.where(fresh, P_reset, jnp.where(cont, Pu, P))
        return x_new, P_new

    vstep = jax.vmap(slot_step)

    def smooth(outs) -> Dict[str, jnp.ndarray]:
        tids = outs["track_id"]  # (T, N)
        bbox = outs["track_bbox"]  # (T, N, 4)
        vel = outs["track_velocity"]  # (T, N, 2)
        vel_count = outs["track_vel_count"]  # (T, N)
        centers = jnp.stack(
            [
                (bbox[..., 0] + bbox[..., 2]) * 0.5,
                (bbox[..., 1] + bbox[..., 3]) * 0.5,
            ],
            axis=-1,
        )

        def body(carry, frame):
            x, P, prev_id = carry
            tid, c, v, vc = frame
            x, P = vstep(x, P, prev_id, tid, c, v, vc)
            out = {
                "positions": x[:, :2],
                "velocities": x[:, 2:4],
                "valid": tid > 0,
            }
            return (x, P, tid), out

        x0 = jnp.zeros((n, 6), jnp.float32)
        P0 = jnp.broadcast_to(jnp.eye(6, dtype=jnp.float32) * p0, (n, 6, 6))
        id0 = jnp.zeros((n,), jnp.int32)
        _, outs_s = jax.lax.scan(
            body,
            (x0, P0, id0),
            (tids, centers.astype(jnp.float32), vel, vel_count),
        )
        return outs_s

    return jax.jit(smooth)
