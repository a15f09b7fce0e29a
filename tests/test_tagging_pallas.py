"""Fused Pallas tagging kernel == the XLA rule engines.

On TPU in detections mode `tagging.rules.make_tagging_step` dispatches
to the single Mosaic kernel in ops/tagging_pallas.py (all three rule
engines in one program); here the same kernel runs through the Pallas
interpreter on CPU and is held to the XLA formulation: every discrete
tag (road types, maneuvers, interactions, counts, flags) must be
EXACTLY equal and every confidence/measure within float32 reassociation
tolerance, over a long random stream with the tagging state threaded
independently through both implementations (so a single divergence
compounds and cannot hide).
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import jax

from multimodal_autonomous_driving_perception_and_planning_tpu import (
    DEFAULT_CONFIG,
)
from multimodal_autonomous_driving_perception_and_planning_tpu.tagging.rules import (
    make_tagging_step,
)
from multimodal_autonomous_driving_perception_and_planning_tpu.types import (
    Detections,
    TaggingState,
    TrackTable,
    VehicleState,
)

_CFG = DEFAULT_CONFIG.replace(use_frames=False, enable_tagging=True)
_T = _CFG.tracker.max_tracks
_D = 16


def _rand_frame(rng, f):
    n = int(rng.integers(0, _D))
    valid = np.zeros(_D, bool)
    valid[:n] = True
    x1 = rng.uniform(0, 600, _D)
    y1 = rng.uniform(0, 440, _D)
    bw = rng.uniform(5, 80, _D)
    bh = rng.uniform(5, 80, _D)
    dets = Detections(
        bbox=jnp.asarray(np.stack([x1, y1, x1 + bw, y1 + bh], 1), jnp.float32),
        class_id=jnp.asarray(rng.integers(0, 8, _D), jnp.int32),
        confidence=jnp.asarray(rng.uniform(0.3, 1.0, _D), jnp.float32),
        valid=jnp.asarray(valid),
    )
    # Persistent-ish tracks: keep ids stable across frames for ~70% of
    # slots so the interaction center-history ring actually accumulates
    # (the cut-in branch needs hist_len >= 10).
    alive = rng.random(_T) < 0.4
    tids = np.where(alive, np.arange(1, _T + 1), 0)
    tx1 = rng.uniform(0, 600, _T)
    ty1 = rng.uniform(0, 440, _T)
    tw = rng.uniform(5, 120, _T)
    th = rng.uniform(1, 120, _T)
    table = TrackTable.empty(_T, _CFG.tracker.trajectory_length)
    table = dataclasses.replace(
        table,
        track_id=jnp.asarray(tids, jnp.int32),
        bbox=jnp.asarray(np.stack([tx1, ty1, tx1 + tw, ty1 + th], 1), jnp.float32),
        class_id=jnp.asarray(rng.integers(0, 8, _T), jnp.int32),
        hits=jnp.asarray(rng.integers(0, 6, _T), jnp.int32),
        velocity=jnp.asarray(rng.normal(0, 3, (_T, 2)), jnp.float32),
        vel_count=jnp.asarray(rng.integers(0, 3, _T), jnp.int32),
    )
    vs = VehicleState(
        x=jnp.float32(rng.uniform(-50, 50)),
        y=jnp.float32(rng.uniform(-50, 50)),
        vx=jnp.float32(0.0),
        vy=jnp.float32(0.0),
        heading=jnp.float32(rng.uniform(-3.1, 3.1)),
        speed=jnp.float32(rng.uniform(0, 20)),
        acceleration=jnp.float32(rng.uniform(-4, 2)),
        yaw_rate=jnp.float32(rng.uniform(-0.4, 0.4)),
        timestamp=jnp.float32(f / 30.0),
        pos_uncertainty=jnp.float32(1.0),
        vel_uncertainty=jnp.float32(1.0),
    )
    return dets, table, vs


def _initial_state():
    return TaggingState.initial(
        _CFG.tagging.scene_smoothing_window,
        _CFG.tagging.maneuver_history,
        _T,
    )


def test_kernel_matches_xla_over_stream():
    xla_step = jax.jit(make_tagging_step(_CFG, backend="cpu"),
                       static_argnums=())
    pal_step = jax.jit(make_tagging_step(_CFG, backend="cpu", interpret=True))

    rng = np.random.default_rng(7)
    s_x = _initial_state()
    s_p = _initial_state()
    for f in range(120):
        dets, table, vs = _rand_frame(rng, f)
        s_x, tags_x = xla_step(s_x, dets, table, None, None, vs, None, None)
        s_p, tags_p = pal_step(s_p, dets, table, None, None, vs, None, None)
        assert set(tags_x) == set(tags_p)
        for k in sorted(tags_x):
            a, b = np.asarray(tags_x[k]), np.asarray(tags_p[k])
            assert a.dtype == b.dtype, (k, a.dtype, b.dtype)
            if a.dtype.kind == "f":
                np.testing.assert_allclose(a, b, atol=1e-5, err_msg=f"{f}:{k}")
            else:
                np.testing.assert_array_equal(a, b, err_msg=f"{f}:{k}")
        for fld in ("scene_votes", "scene_count", "man_history", "man_count",
                    "int_centers", "int_len", "int_track_id", "frame_count"):
            a = np.asarray(getattr(s_x, fld))
            b = np.asarray(getattr(s_p, fld))
            np.testing.assert_allclose(a, b, atol=1e-6, err_msg=f"{f}:{fld}")


def test_kernel_vmap_batches():
    """The fused tagging step must stay vmappable (the multicamera runner
    vmaps the whole pipeline step over cameras) — all scalar channels are
    2-D rows for the Mosaic batched-block check, same pattern as
    ops/kalman_pallas.py."""
    pal_step = make_tagging_step(_CFG, backend="cpu", interpret=True)
    rng = np.random.default_rng(3)
    frames = [_rand_frame(rng, f) for f in range(3)]
    states = [_initial_state() for _ in frames]

    def one(state, dets, table, vs):
        return pal_step(state, dets, table, None, None, vs, None, None)

    b_state = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *states
    )
    b_dets = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *[f[0] for f in frames])
    b_table = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *[f[1] for f in frames])
    b_vs = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *[f[2] for f in frames])
    bs, btags = jax.jit(jax.vmap(one))(b_state, b_dets, b_table, b_vs)
    for i, (dets, table, vs) in enumerate(frames):
        _, tags = one(states[i], dets, table, vs)
        for k in sorted(tags):
            a = np.asarray(tags[k])
            b = np.asarray(jax.tree_util.tree_map(lambda x: x[i], btags[k]))
            if a.dtype.kind == "f":
                np.testing.assert_allclose(a, b, atol=1e-6, err_msg=k)
            else:
                np.testing.assert_array_equal(a, b, err_msg=k)


def _rand_lane_feats(rng):
    from multimodal_autonomous_driving_perception_and_planning_tpu.types import (
        LaneObservation,
    )

    lf = bool(rng.random() < 0.7)
    rf = bool(rng.random() < 0.7)
    lane_obs = LaneObservation(
        left_fit=jnp.asarray(rng.normal(0, [1e-4, 0.3, 200]), jnp.float32),
        right_fit=jnp.asarray(rng.normal([0, 0, 450], [1e-4, 0.3, 100]), jnp.float32),
        left_found=jnp.asarray(lf),
        right_found=jnp.asarray(rf),
        left_confidence=jnp.float32(rng.uniform(0, 1)),
        right_confidence=jnp.float32(rng.uniform(0, 1)),
        offset_px=jnp.float32(rng.normal(0, 10)),
        has_offset=jnp.asarray(lf and rf),
    )
    feats = {
        "center_edge_density": jnp.float32(rng.uniform(0, 0.4)),
        "num_long_lines": jnp.int32(rng.integers(0, 12)),
        "avg_line_length": jnp.float32(rng.uniform(50, 300)),
        "green_ratio": jnp.float32(rng.uniform(0, 0.3)),
        "brightness": jnp.float32(rng.uniform(30, 200)),
        "laplacian_var": jnp.float32(rng.uniform(20, 2000)),
    }
    return lane_obs, feats


def test_kernel_matches_xla_frames_mode():
    """Frames mode (lane fits + scene features) through the kernel's
    frames branch: exactly equal discrete tags vs the XLA engines over a
    threaded random stream."""
    cfg = DEFAULT_CONFIG.replace(use_frames=True, enable_tagging=True)
    xla_step = jax.jit(make_tagging_step(cfg, backend="cpu"))
    pal_step = jax.jit(make_tagging_step(cfg, backend="cpu", interpret=True))

    rng = np.random.default_rng(11)
    s_x = _initial_state()
    s_p = _initial_state()
    for f in range(60):
        dets, table, vs = _rand_frame(rng, f)
        lane_obs, feats = _rand_lane_feats(rng)
        s_x, tags_x = xla_step(s_x, dets, table, None, None, vs, lane_obs, feats)
        s_p, tags_p = pal_step(s_p, dets, table, None, None, vs, lane_obs, feats)
        assert set(tags_x) == set(tags_p)
        for k in sorted(tags_x):
            a, b = np.asarray(tags_x[k]), np.asarray(tags_p[k])
            assert a.dtype == b.dtype, (k, a.dtype, b.dtype)
            if a.dtype.kind == "f":
                np.testing.assert_allclose(a, b, atol=1e-5, err_msg=f"{f}:{k}")
            else:
                np.testing.assert_array_equal(a, b, err_msg=f"{f}:{k}")
        for fld in ("scene_votes", "scene_count", "man_history", "man_count",
                    "int_centers", "int_len", "int_track_id", "frame_count"):
            np.testing.assert_allclose(
                np.asarray(getattr(s_x, fld)), np.asarray(getattr(s_p, fld)),
                atol=1e-6, err_msg=f"{f}:{fld}",
            )
