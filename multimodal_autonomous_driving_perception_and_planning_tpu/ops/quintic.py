"""Closed-form quintic trajectory sampling + cost scoring.

TPU-native replacement for the reference planner's hottest Python loops
(src/planning/motion_planner.py:126-262): the 21-candidate x 51-waypoint
nest becomes a handful of broadcasted (C, N) tensor expressions, evaluated
in one fused XLA computation and reduced with an argmin — no per-waypoint
interpreter iterations.

Semantics are kept bit-compatible with the reference:
  * velocity blend v(t) = v0 + (vt - v0)(1 - e^{-t})           (:151-157)
  * arc length s[i] = s[i-1] + v[i] * dt with s[0] = 0          (:156-157)
  * lateral d(tau) = df (10 tau^3 - 15 tau^4 + 6 tau^5)         (:163-169)
  * Frenet->global via heading rotation                          (:171-180)
  * finite-diff heading with the last waypoint repeating the
    previous heading                                             (:182-190)
  * curvature = dheading / (v dt + 1e-6), zero at both ends      (:192-196)
  * cost = w_v sum (v-10)^2 + w_a sum accel^2 + w_c sum kappa^2
    [+ lateral-to-reference and obstacle terms]                  (:206-262)
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp


class CandidateSet(NamedTuple):
    positions: jnp.ndarray  # (C, N, 2)
    headings: jnp.ndarray  # (C, N)
    velocities: jnp.ndarray  # (C, N)
    curvatures: jnp.ndarray  # (C, N)
    timestamps: jnp.ndarray  # (N,)
    lateral_offsets: jnp.ndarray  # (C,)
    target_velocities: jnp.ndarray  # (C,)


def candidate_grid(
    num_samples: int, lateral_range: float, target_velocities
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The reference's (lateral offset x target velocity) grid in its loop
    order: offsets outer, velocities inner (motion_planner.py:282-297)."""
    offs = jnp.linspace(-lateral_range, lateral_range, num_samples)
    vels = jnp.asarray(target_velocities, jnp.float32)
    lat = jnp.repeat(offs, vels.shape[0])
    tv = jnp.tile(vels, offs.shape[0])
    return lat.astype(jnp.float32), tv


def generate_candidates(
    start_state: jnp.ndarray,
    lateral_offsets: jnp.ndarray,
    target_velocities: jnp.ndarray,
    planning_horizon: float,
    dt: float,
) -> CandidateSet:
    """Generate all candidate trajectories at once.

    Args:
      start_state: (4,) [x, y, heading, velocity].
      lateral_offsets: (C,) final lateral offsets df.
      target_velocities: (C,) target speeds.
    """
    x0, y0, heading0, v0 = (start_state[i] for i in range(4))
    n = int(planning_horizon / dt) + 1
    t = jnp.linspace(0.0, planning_horizon, n).astype(jnp.float32)  # (N,)

    # Velocity profile and arc length (s[0]=0; s[i] accumulates v[i]*dt).
    alpha = 1.0 - jnp.exp(-t)  # (N,)
    vel = v0 + (target_velocities[:, None] - v0) * alpha[None, :]  # (C, N)
    s = (jnp.cumsum(vel, axis=1) - vel[:, :1]) * dt  # (C, N)

    # Quintic lateral blend.
    tau = jnp.clip(t / planning_horizon, 0.0, 1.0)
    blend = 10.0 * tau**3 - 15.0 * tau**4 + 6.0 * tau**5  # (N,)
    lat = lateral_offsets[:, None] * blend[None, :]  # (C, N)

    # Frenet -> global.
    c, sn = jnp.cos(heading0), jnp.sin(heading0)
    cp, sp = jnp.cos(heading0 + jnp.pi / 2), jnp.sin(heading0 + jnp.pi / 2)
    x = x0 + s * c + lat * cp
    y = y0 + s * sn + lat * sp
    positions = jnp.stack([x, y], axis=-1)  # (C, N, 2)

    # Finite-difference heading; last waypoint repeats the previous heading.
    dx = x[:, 1:] - x[:, :-1]
    dy = y[:, 1:] - y[:, :-1]
    head = jnp.arctan2(dy, dx)  # (C, N-1)
    headings = jnp.concatenate([head, head[:, -1:]], axis=1)  # (C, N)

    # Curvature: dheading / (v dt + 1e-6); zero at the first and last point.
    dhead = headings[:, 1:] - headings[:, :-1]  # (C, N-1), index i -> i+1
    kappa_mid = dhead[:, :-1] / (vel[:, 1:-1] * dt + 1e-6)  # (C, N-2)
    zeros = jnp.zeros_like(kappa_mid[:, :1])
    curvatures = jnp.concatenate([zeros, kappa_mid, zeros], axis=1)  # (C, N)

    return CandidateSet(
        positions=positions,
        headings=headings,
        velocities=vel,
        curvatures=curvatures,
        timestamps=t,
        lateral_offsets=lateral_offsets,
        target_velocities=target_velocities,
    )


def evaluate_costs(
    cand: CandidateSet,
    w_lateral: float,
    w_velocity: float,
    w_acceleration: float,
    w_curvature: float,
    cruise_velocity: float = 10.0,
    reference_positions: Optional[jnp.ndarray] = None,  # (R, 2)
    reference_valid: Optional[jnp.ndarray] = None,  # (R,) bool
    obstacles: Optional[jnp.ndarray] = None,  # (O, 3) x, y, radius
    obstacles_valid: Optional[jnp.ndarray] = None,  # (O,) bool
) -> jnp.ndarray:
    """Total cost per candidate, matching motion_planner.py:206-262."""
    vel = cand.velocities  # (C, N)
    t = cand.timestamps  # (N,)

    cost = w_velocity * jnp.sum((vel - cruise_velocity) ** 2, axis=1)

    dts = t[1:] - t[:-1]  # (N-1,)
    accel = (vel[:, 1:] - vel[:, :-1]) / jnp.where(dts > 0, dts, 1.0)
    accel = jnp.where(dts > 0, accel, 0.0)
    cost = cost + w_acceleration * jnp.sum(accel**2, axis=1)

    cost = cost + w_curvature * jnp.sum(cand.curvatures**2, axis=1)

    if reference_positions is not None:
        # (C, N, R) pairwise distances, masked min over reference points.
        diff = cand.positions[:, :, None, :] - reference_positions[None, None, :, :]
        dist = jnp.linalg.norm(diff, axis=-1)
        if reference_valid is not None:
            dist = jnp.where(reference_valid[None, None, :], dist, jnp.inf)
        min_dist = jnp.min(dist, axis=-1)  # (C, N)
        lat_cost = jnp.sum(min_dist**2, axis=1)
        # With no valid reference point the reference skips the term entirely.
        any_ref = (
            jnp.any(reference_valid)
            if reference_valid is not None
            else jnp.asarray(True)
        )
        cost = cost + jnp.where(any_ref, w_lateral * lat_cost, 0.0)

    if obstacles is not None:
        ox = obstacles[:, 0][None, None, :]  # (1, 1, O)
        oy = obstacles[:, 1][None, None, :]
        orad = obstacles[:, 2][None, None, :]
        dx = cand.positions[:, :, None, 0] - ox
        dy = cand.positions[:, :, None, 1] - oy
        dist = jnp.sqrt(dx**2 + dy**2)  # (C, N, O)
        hard = jnp.where(dist < orad * 2, 1000.0 * (orad * 2 - dist), 0.0)
        soft = jnp.where(
            (dist >= orad * 2) & (dist < orad * 4),
            10.0 / (dist - orad + 0.1),
            0.0,
        )
        pen = hard + soft
        if obstacles_valid is not None:
            pen = jnp.where(obstacles_valid[None, None, :], pen, 0.0)
        cost = cost + jnp.sum(pen, axis=(1, 2))

    return cost
