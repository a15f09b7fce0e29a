"""Motion planner: vmapped candidate generation + argmin selection.

TPU-native rebuild of src/planning/motion_planner.py:264-303.  The
reference's 21 x 51 double Python loop becomes one broadcasted tensor
program (ops.quintic); selection is a stable argsort over 21 costs so the
full sorted candidate list matches ``candidates.sort(key=cost)``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from ..config import PlannerConfig
from ..ops.quintic import candidate_grid, evaluate_costs, generate_candidates
from ..types import PlanResult


def make_reference_path(
    waypoints, capacity: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pad an (R, 2) reference path into the fixed-capacity buffer used by
    the cost kernel (mirrors set_reference_path, motion_planner.py:93-124 —
    only the positions matter to the cost, :224-231)."""
    wp = jnp.asarray(waypoints, jnp.float32).reshape(-1, 2)
    n = wp.shape[0]
    if n > capacity:
        raise ValueError(f"reference path has {n} points, capacity {capacity}")
    buf = jnp.zeros((capacity, 2), jnp.float32).at[:n].set(wp)
    valid = jnp.arange(capacity) < n
    return buf, valid


def plan(
    current_state: jnp.ndarray,
    cfg: PlannerConfig,
    reference_positions: Optional[jnp.ndarray] = None,
    reference_valid: Optional[jnp.ndarray] = None,
    obstacles: Optional[jnp.ndarray] = None,
    obstacles_valid: Optional[jnp.ndarray] = None,
) -> PlanResult:
    """Plan from (x, y, heading, velocity).

    Returns a PlanResult whose `best` equals the reference's
    ``candidates.sort(key=cost)[0]`` (stable: first minimum wins) and whose
    `order` reproduces the full sorted candidate list.
    """
    lat, tv = candidate_grid(cfg.num_samples, cfg.lateral_range, cfg.target_velocities)
    cand = generate_candidates(
        jnp.asarray(current_state, jnp.float32),
        lat,
        tv,
        cfg.planning_horizon,
        cfg.dt,
    )
    costs = evaluate_costs(
        cand,
        w_lateral=cfg.w_lateral,
        w_velocity=cfg.w_velocity,
        w_acceleration=cfg.w_acceleration,
        w_curvature=cfg.w_curvature,
        cruise_velocity=cfg.cruise_velocity,
        reference_positions=reference_positions,
        reference_valid=reference_valid,
        obstacles=obstacles,
        obstacles_valid=obstacles_valid,
    )
    order = jnp.argsort(costs, stable=True).astype(jnp.int32)
    best = order[0]
    return PlanResult(
        positions=cand.positions,
        headings=cand.headings,
        velocities=cand.velocities,
        curvatures=cand.curvatures,
        timestamps=cand.timestamps,
        costs=costs,
        lateral_offsets=cand.lateral_offsets,
        target_velocities=cand.target_velocities,
        best=best,
        order=order,
    )


def trajectory_type(lateral_offset: float) -> str:
    """Host-side label mirroring motion_planner.py:288-294."""
    if abs(lateral_offset) < 0.5:
        return "lane_keep"
    if lateral_offset < 0:
        return "lane_change_left"
    return "lane_change_right"
