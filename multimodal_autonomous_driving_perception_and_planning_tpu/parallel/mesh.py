"""Multi-camera scale-out over a device mesh.

The reference has no distributed execution at all (SURVEY.md section 2.2); this
module is the TPU-native scale story: N camera feeds are sharded over an ICI
mesh with `shard_map`, each device runs the full fused pipeline scan on its
camera shard, and fleet-level summaries (global confirmed-track count, risk
histogram inputs) ride a `psum` over the camera axis — the only cross-camera
communication, so everything else is pure ICI-free data parallelism.

The camera axis composes with `vmap`: multiple cameras per device are handled
by a local vmap inside the shard.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import PipelineConfig
from ..pipeline import initial_state, make_pipeline_step, pack_tree, unpack_tree
from ..types import Detections, PipelineState


def make_camera_mesh(
    n_devices: Optional[int] = None, axis_name: str = "camera"
) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def stack_states(cfg: PipelineConfig, n_cameras: int) -> PipelineState:
    """Per-camera pipeline states stacked on a leading camera axis."""
    one = initial_state(cfg)
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n_cameras,) + x.shape), one
    )


def make_multicamera_runner(cfg: PipelineConfig, mesh: Mesh):
    """Build a jitted multi-camera sequence runner.

    Inputs: dict of (C, T, ...) arrays (camera-major, then time):
      bbox (C, T, D, 4), class_id, confidence, valid, ego_measurement (C, T, 4)
    State: PipelineState stacked on the camera axis (see `stack_states`).

    Returns (final_states, outputs, fleet_summary) where outputs carry a
    leading (C, T) and fleet_summary is psum-reduced over cameras.
    """
    axis = mesh.axis_names[0]
    step = make_pipeline_step(cfg)
    spec_cell: list = []

    def body(carry, xs):
        # Pack per-frame outputs so the scan stacks ~8 arrays, not ~40
        # (each stacked array costs one dynamic-update-slice per frame).
        new_state, out = step(carry, xs)
        packed, spec = pack_tree(out)
        # Overwrite on every trace so a retrace never unpacks with a stale
        # spec (the spec is static Python data; see pipeline.make_sequence_runner).
        spec_cell[:] = [spec]
        return new_state, packed

    def per_camera_scan(state, inputs):
        det = Detections(
            bbox=inputs["bbox"],
            class_id=inputs["class_id"],
            confidence=inputs["confidence"],
            valid=inputs["valid"],
        )
        scan_in = {"detections": det, "ego_measurement": inputs["ego_measurement"]}
        if "frame" in inputs:
            scan_in["frame"] = inputs["frame"]
        final, packed = jax.lax.scan(body, state, scan_in)
        return final, unpack_tree(packed, spec_cell[0])

    def shard_fn(state, inputs):
        # Local camera chunk: vmap the scan over cameras on this device.
        final, outs = jax.vmap(per_camera_scan)(state, inputs)
        # Fleet summary over ICI: total confirmed tracks per frame.
        local_counts = jnp.sum(outs["num_confirmed"], axis=0)  # (T,)
        fleet_counts = jax.lax.psum(local_counts, axis)
        return final, outs, {"fleet_confirmed_per_frame": fleet_counts}

    spec = P(axis)
    mapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=(spec, spec, P()),
        check_vma=False,
    )
    return jax.jit(mapped)
