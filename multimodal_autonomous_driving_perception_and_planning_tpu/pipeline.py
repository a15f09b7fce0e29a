"""The fused per-frame pipeline and its scan runner.

The reference orchestrates detect -> lane -> track -> estimate -> plan as a
Python loop over per-frame method calls (demo.py:97-177).  Here the whole
per-frame dataflow is one pure function ``(state, inputs) -> (state', out)``,
jitted once; a video is ``jax.lax.scan(step, init, inputs)`` so an entire
sequence runs as a single device program with no host round-trips.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .config import PipelineConfig
from .estimation.ego import estimator_step
from .ops.kalman import make_constant_accel_model
from .planning.planner import plan
from .tracking.tracker import tracker_update_with_order
from .types import Detections, KalmanState, LaneState, PipelineState, TaggingState, TrackTable


def initial_state(cfg: PipelineConfig) -> PipelineState:
    return PipelineState(
        tracks=TrackTable.empty(cfg.tracker.max_tracks, cfg.tracker.trajectory_length),
        kalman=KalmanState.initial(cfg.estimator.initial_covariance),
        lanes=LaneState.initial(),
        tagging=TaggingState.initial(
            cfg.tagging.scene_smoothing_window,
            cfg.tagging.maneuver_history,
            cfg.tracker.max_tracks,
            interaction_history=cfg.tagging.interaction_history,
        ),
        frame_idx=jnp.asarray(0, jnp.int32),
    )


def detections_from_arrays(arrs: Dict[str, Any]) -> Detections:
    return Detections(
        bbox=jnp.asarray(arrs["bbox"], jnp.float32),
        class_id=jnp.asarray(arrs["class_id"], jnp.int32),
        confidence=jnp.asarray(arrs["confidence"], jnp.float32),
        valid=jnp.asarray(arrs["valid"], bool),
    )


def make_pipeline_step(cfg: PipelineConfig, backend: str | None = None):
    """Build the per-frame step function.

    Inputs per frame (all fixed-shape):
      detections: Detections table
      ego_measurement: (4,) [x, y, vx, vy]
      frame: optional (H, W, 3) image (enables lane detection + scene
        features; wired in by perception/lanes and tagging stages)

    ``backend``: None (default) selects kernel-vs-XLA formulations at
    lowering time (`ops.dispatch`); "tpu"/"cpu" pins one at trace time —
    multi-platform AOT export pins "cpu" because Pallas calls cannot be
    lowered for non-TPU platforms (utils/export.py).

    Outputs: dict of per-frame results (stacked over time under scan).
    """
    model = make_constant_accel_model(
        cfg.estimator.dt,
        cfg.estimator.process_noise,
        cfg.estimator.measurement_noise,
        cfg.estimator.accel_noise_scale,
    )
    # Imported lazily to keep the minimum slice importable while the image
    # stages are being built out.
    lane_step = None
    tagging_step = None
    if cfg.use_frames:
        from .perception.lanes import make_lane_step

        lane_step = make_lane_step(cfg)
    if cfg.enable_tagging:
        from .tagging.rules import make_tagging_step

        tagging_step = make_tagging_step(cfg, backend=backend)

    def step(state: PipelineState, inputs: Dict[str, Any]):
        dets = inputs["detections"]

        # L1: lanes (device kernels) — optional, needs the camera frame.
        if lane_step is not None and "frame" in inputs:
            lanes_state, lane_obs, frame_feats = lane_step(
                state.lanes, inputs["frame"]
            )
        else:
            lanes_state, lane_obs, frame_feats = state.lanes, None, None

        # L2: tracking (one fused Pallas kernel on TPU, incl. the
        # confirmed-order ranking; XLA path + confirmed_order elsewhere).
        table, match, order, n_confirmed = tracker_update_with_order(
            state.tracks, dets, cfg.tracker, cfg.tracker.min_hits,
            backend=backend,
        )

        # L2: ego estimation.
        kalman, vstate = estimator_step(
            state.kalman,
            model,
            inputs["ego_measurement"].astype(jnp.float32),
            inputs.get("has_measurement", jnp.asarray(True)),
            cfg.estimator,
            backend=backend,
        )

        # L3: planning.
        current = jnp.stack([vstate.x, vstate.y, vstate.heading, vstate.speed])
        pr = plan(
            current,
            cfg.planner,
            reference_positions=inputs.get("reference_positions"),
            reference_valid=inputs.get("reference_valid"),
            obstacles=inputs.get("obstacles"),
            obstacles_valid=inputs.get("obstacles_valid"),
        )

        # L4: rule-based tagging (device math over pipeline outputs).
        if tagging_step is not None:
            tagging_state, tags = tagging_step(
                state.tagging,
                dets=dets,
                table=table,
                confirmed=order,
                n_confirmed=n_confirmed,
                vstate=vstate,
                lane_obs=lane_obs,
                frame_feats=frame_feats,
            )
        else:
            tagging_state, tags = state.tagging, {}

        new_state = PipelineState(
            tracks=table,
            kalman=kalman,
            lanes=lanes_state,
            tagging=tagging_state,
            frame_idx=state.frame_idx + 1,
        )
        out = {
            "track_id": table.track_id,
            "track_bbox": table.bbox,
            "track_class_id": table.class_id,
            "track_confidence": table.confidence,
            "track_hits": table.hits,
            "track_misses": table.misses,
            "track_age": table.age,
            "track_velocity": table.velocity,
            "track_vel_count": table.vel_count,
            "confirmed_order": order,
            "num_confirmed": n_confirmed,
            "match": match,
            "vehicle_state": vstate,
            "plan_costs": pr.costs,
            "plan_best": pr.best,
            "plan_best_positions": pr.positions[pr.best],
            "plan_best_velocities": pr.velocities[pr.best],
            "tags": tags,
        }
        # Bulky viz-only outputs are opt-in (see PipelineConfig.emit_*):
        # stacking them costs more than computing the rest of the frame.
        if cfg.emit_trajectories:
            out["track_trajectory"] = table.trajectory
            out["track_traj_len"] = table.traj_len
        if cfg.emit_candidates:
            out["plan_order"] = pr.order
            out["plan_positions"] = pr.positions
            out["plan_velocities"] = pr.velocities
            out["plan_lateral_offsets"] = pr.lateral_offsets
        if lane_obs is not None:
            out["lane_obs"] = lane_obs
        return new_state, out

    return step


def pack_tree(tree):
    """Compact a pytree of per-frame outputs into a few packed arrays.

    Each array stacked by `lax.scan` costs one dynamic-update-slice per
    iteration (~1.4 us/frame each on TPU), so the raw ~40-leaf output dict
    spends far more time stacking than computing.  Grouping leaves —
    scalars by dtype into one vector, (N, ...) arrays by (N, dtype) into
    one (N, K) matrix — cuts the per-frame slice count to ~8.  ``unpack``
    restores the exact original pytree by slicing the *stacked* arrays once
    after the scan, which is O(1) ops per group instead of per frame.

    Returns (packed: list of arrays, spec) — spec is static Python data.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    groups: Dict[Any, list] = {}
    for i, leaf in enumerate(leaves):
        if leaf.ndim == 0:
            key = ("scalar", jnp.dtype(leaf.dtype).name)
        else:
            key = ("array", int(leaf.shape[0]), jnp.dtype(leaf.dtype).name)
        groups.setdefault(key, []).append(i)

    packed = []
    spec_groups = []
    for key in sorted(groups, key=repr):
        idxs = groups[key]
        members = []
        if key[0] == "scalar":
            packed.append(jnp.stack([leaves[i] for i in idxs]))
            members = [(i, ()) for i in idxs]
        else:
            n = key[1]
            cols = []
            for i in idxs:
                leaf = leaves[i]
                trailing = leaf.shape[1:]
                cols.append(leaf.reshape(n, -1))
                members.append((i, tuple(trailing)))
            packed.append(jnp.concatenate(cols, axis=1) if len(cols) > 1 else cols[0])
        spec_groups.append((key, members))
    return packed, (treedef, spec_groups, len(leaves))


def unpack_tree(packed, spec):
    """Inverse of `pack_tree` for arrays carrying an extra leading (time)
    axis added by `lax.scan` stacking."""
    treedef, spec_groups, n_leaves = spec
    leaves = [None] * n_leaves
    for arr, (key, members) in zip(packed, spec_groups):
        if key[0] == "scalar":
            for j, (i, _) in enumerate(members):
                leaves[i] = arr[..., j]
        else:
            n = key[1]
            off = 0
            for i, trailing in members:
                width = 1
                for d in trailing:
                    width *= d
                piece = arr[..., off : off + width]
                leaves[i] = piece.reshape(arr.shape[:-2] + (n,) + trailing)
                off += width
    return jax.tree_util.tree_unflatten(treedef, leaves)


_REQUIRED_INPUT_KEYS = frozenset(
    {"bbox", "class_id", "confidence", "valid", "ego_measurement"}
)
_OPTIONAL_INPUT_KEYS = frozenset(
    {
        "has_measurement",  # estimator measurement-skip branch
        "reference_positions",  # planner reference-path cost
        "reference_valid",
        "obstacles",  # planner obstacle penalties
        "obstacles_valid",
    }
)


def make_sequence_runner(
    cfg: PipelineConfig, donate: bool = True, backend: str | None = None
):
    """Build a jitted runner that scans the pipeline over a whole sequence.

    ``inputs`` is a dict of time-stacked arrays: detections (T, D, ...) as
    raw arrays, ego_measurements (T, 4), optional frames (T, H, W, 3).

    Internally the per-frame outputs are packed (see `pack_tree`) so the
    scan stacks ~8 arrays instead of ~40; the returned ``outs`` dict has
    the same structure as `make_pipeline_step`'s output with a leading
    time axis.
    """
    step = make_pipeline_step(cfg, backend=backend)
    spec_cell: list = []

    def body(carry, xs):
        new_state, out = step(carry, xs)
        packed, spec = pack_tree(out)
        # Overwrite on every trace: the spec is static Python data, and a
        # retrace with different input shapes must not unpack with a stale
        # spec from the first trace.
        spec_cell[:] = [spec]
        return new_state, packed

    def run(state: PipelineState, inputs: Dict[str, Any]):
        det_tables = Detections(
            bbox=inputs["bbox"],
            class_id=inputs["class_id"],
            confidence=inputs["confidence"],
            valid=inputs["valid"],
        )
        scan_inputs = {
            "detections": det_tables,
            "ego_measurement": inputs["ego_measurement"],
        }
        if "frame" in inputs:
            scan_inputs["frame"] = inputs["frame"]
        # Optional per-frame inputs the step supports: forward them rather
        # than silently computing with every frame "measured" and no
        # obstacle/reference costs, and reject keys the step would ignore.
        for key in _OPTIONAL_INPUT_KEYS:
            if key in inputs:
                scan_inputs[key] = inputs[key]
        unknown = (
            set(inputs)
            - _REQUIRED_INPUT_KEYS
            - _OPTIONAL_INPUT_KEYS
            - {"frame"}
        )
        if unknown:
            raise ValueError(
                f"unknown sequence inputs {sorted(unknown)}; supported: "
                f"{sorted(_REQUIRED_INPUT_KEYS | _OPTIONAL_INPUT_KEYS)} + 'frame'"
            )

        final, packed_outs = jax.lax.scan(body, state, scan_inputs)
        outs = unpack_tree(packed_outs, spec_cell[0])
        return final, outs

    return jax.jit(run, donate_argnums=(0,) if donate else ())
