"""Planner parity: candidate tensors, costs, and stable selection order."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_autonomous_driving_perception_and_planning_tpu.config import PlannerConfig
from multimodal_autonomous_driving_perception_and_planning_tpu.planning.planner import (
    make_reference_path,
    plan,
)
from oracle import oracle_plan


def test_planner_matches_oracle_no_obstacles():
    cfg = PlannerConfig()
    state = (3.2, -1.5, 0.12, 9.3)
    pr = jax.jit(lambda s: plan(s, cfg))(jnp.asarray(state, jnp.float32))
    want, order = oracle_plan(state)

    got_costs = np.asarray(pr.costs)
    for c in range(21):
        np.testing.assert_allclose(got_costs[c], want[c]["cost"], rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(
            np.asarray(pr.positions)[c, :, 0], want[c]["x"], atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(pr.positions)[c, :, 1], want[c]["y"], atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(pr.velocities)[c], want[c]["velocity"], atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(pr.curvatures)[c], want[c]["curvature"], atol=1e-3
        )
    assert int(pr.best) == order[0]
    assert np.asarray(pr.order).tolist() == order


def test_planner_obstacle_penalty():
    cfg = PlannerConfig()
    state = (0.0, 0.0, 0.0, 10.0)
    obstacles = [(20.0, 0.0, 2.0)]
    obs = jnp.asarray(obstacles, jnp.float32)
    valid = jnp.asarray([True])
    pr = plan(jnp.asarray(state, jnp.float32), cfg, obstacles=obs, obstacles_valid=valid)
    want, order = oracle_plan(state, obstacles=obstacles)
    np.testing.assert_allclose(
        np.asarray(pr.costs), [w["cost"] for w in want], rtol=1e-4, atol=1e-2
    )
    assert int(pr.best) == order[0]
    # The straight-ahead candidate should no longer be optimal.
    assert abs(float(pr.lateral_offsets[pr.best])) > 0.4


def test_planner_reference_path_cost():
    cfg = PlannerConfig()
    state = (0.0, 0.0, 0.0, 10.0)
    ref = [(float(i), 1.0) for i in range(20)]
    buf, valid = make_reference_path(ref, cfg.max_reference_points)
    pr = plan(
        jnp.asarray(state, jnp.float32),
        cfg,
        reference_positions=buf,
        reference_valid=valid,
    )
    want, order = oracle_plan(state, reference_positions=ref)
    np.testing.assert_allclose(
        np.asarray(pr.costs), [w["cost"] for w in want], rtol=1e-4, atol=1e-2
    )
    assert int(pr.best) == order[0]


def test_planner_best_is_first_min_on_ties():
    # Degenerate state where several candidates could tie: stable argsort must
    # pick the earliest index, like Python's stable sort.
    cfg = PlannerConfig()
    pr = plan(jnp.asarray([0.0, 0.0, 0.0, 10.0], jnp.float32), cfg)
    costs = np.asarray(pr.costs)
    assert int(pr.best) == int(np.flatnonzero(costs == costs.min())[0])
