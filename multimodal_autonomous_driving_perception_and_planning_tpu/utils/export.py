"""Ahead-of-time export of the compiled pipeline (serving artifact).

The reference has no deployment story beyond "run the Python script"
(demo.py:201-231).  A TPU-native framework serves from a compiled
artifact: this module serializes the fused sequence runner (the whole
detect->track->estimate->plan[->tag] scan) to portable StableHLO bytes
via ``jax.export``, so a serving process can run the exact pinned
computation with zero retracing/recompilation risk, across JAX versions,
on any exported-for platform.

Calling convention: the exported function takes/returns *flat leaf
lists* (deterministic ``jax.tree_util`` flatten order), so the artifact
does not depend on custom-pytree serialization.  ``deserialize_runner``
rebuilds the (state, inputs-dict) -> (state', outputs) wrapper from the
same config, which must match the one used at export time (leaf count
and shapes are checked by the exported signature itself).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PipelineConfig
from ..pipeline import initial_state, make_sequence_runner


def example_sequence_inputs(cfg: PipelineConfig, num_frames: int) -> Dict[str, Any]:
    """Zero-filled, correctly-shaped time-stacked inputs for tracing."""
    d = cfg.detector.max_detections
    inputs: Dict[str, Any] = {
        "bbox": jnp.zeros((num_frames, d, 4), jnp.float32),
        "class_id": jnp.zeros((num_frames, d), jnp.int32),
        "confidence": jnp.zeros((num_frames, d), jnp.float32),
        "valid": jnp.zeros((num_frames, d), bool),
        "ego_measurement": jnp.zeros((num_frames, 4), jnp.float32),
    }
    if cfg.use_frames:
        inputs["frame"] = jnp.zeros(
            (num_frames, cfg.frame_height, cfg.frame_width, 3), jnp.int32
        )
    return inputs


def lane_sharding(dp: int):
    """(mesh, shard_for_leaf) sharding the leading session-lane axis over
    the first ``dp`` local devices — the serving tier's scale-out story:
    micro-batched lanes are data-parallel, so B lanes over D chips is one
    GSPMD program with the lane axis mesh-sharded (collective-free; each
    chip advances B/D sessions; results ride ICI only at host gather).
    """
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    devices = jax.devices()
    if dp > len(devices):
        raise ValueError(f"dp={dp} exceeds {len(devices)} available devices")
    mesh = Mesh(np.array(devices[:dp]), ("sessions",))

    def shard_for(leaf) -> NamedSharding:
        return NamedSharding(
            mesh, PartitionSpec("sessions", *([None] * (np.ndim(leaf) - 1)))
        )

    return mesh, shard_for


def _flat_runner(
    cfg: PipelineConfig,
    num_frames: int,
    backend: str | None = None,
    batch: int = 1,
):
    """(flat_fn, example_leaves, in_tree, out_tree) for the scan runner.

    ``batch > 1`` vmaps the runner over a leading session axis: one device
    program advances ``batch`` independent scan states at once (the serving
    tier's micro-batching, apps/serve.py).  Lanes are data-parallel — each
    lane's discrete outputs are bit-identical to the unbatched runner on
    the same (state, inputs), floats within ~1e-9 (vmap changes XLA fusion
    order); asserted in tests/test_serve.py.
    """
    run = make_sequence_runner(cfg, donate=False, backend=backend)
    # Shape/dtype SPECS only — never materialize the example buffers here
    # (a batched frames-mode chunk would be batch x ~236 MB of zeros, and
    # a server startup calls this twice: export + deserialize).
    state = jax.eval_shape(lambda: initial_state(cfg))
    inputs = jax.eval_shape(lambda: example_sequence_inputs(cfg, num_frames))
    if batch > 1:
        run = jax.vmap(run)
        tile = lambda a: jax.ShapeDtypeStruct(  # noqa: E731
            (batch,) + tuple(a.shape), a.dtype
        )
        state = jax.tree_util.tree_map(tile, state)
        inputs = jax.tree_util.tree_map(tile, inputs)
    example_leaves, in_tree = jax.tree_util.tree_flatten((state, inputs))

    out_shapes = jax.eval_shape(run, state, inputs)
    _, out_tree = jax.tree_util.tree_flatten(out_shapes)

    def flat_fn(*leaves):
        s, i = jax.tree_util.tree_unflatten(in_tree, leaves)
        result = run(s, i)
        return jax.tree_util.tree_leaves(result)

    return flat_fn, example_leaves, in_tree, out_tree


def export_sequence_runner(
    cfg: PipelineConfig,
    num_frames: int,
    platforms: Sequence[str] = ("tpu", "cpu"),
    batch: int = 1,
    dp: int = 1,
) -> bytes:
    """Serialize the compiled ``num_frames``-frame scan runner.

    ``platforms`` selects the lowering targets baked into the artifact
    (lowering needs no physical device; a TPU-targeted artifact can be
    produced on a CPU-only host).

    A TPU-only artifact carries the fused Pallas kernels (selected at
    lowering time, `ops.dispatch` — regardless of the exporting host's
    platform).  A multi-platform artifact pins the portable XLA
    formulations instead: JAX cannot lower a Pallas TPU call for non-TPU
    platforms, so one program body must serve every target.  The serving
    tier (apps/serve.py) exports single-platform and therefore always
    gets the kernels.

    ``dp > 1`` (requires ``batch % dp == 0``) exports a GSPMD program with
    the session-lane axis sharded over ``dp`` devices (``lane_sharding``):
    the artifact pins the device count and partitioning, and callers must
    commit inputs to the lane sharding (``deserialize_runner`` does).
    """
    from jax import export as jexport

    platforms = tuple(platforms)
    backend = None if platforms == ("tpu",) else "cpu"
    flat_fn, example_leaves, _, _ = _flat_runner(cfg, num_frames, backend, batch)
    if dp > 1:
        if batch % dp != 0:
            raise ValueError(f"batch={batch} must be a multiple of dp={dp}")
        _, shard_for = lane_sharding(dp)
        specs = [
            jax.ShapeDtypeStruct(l.shape, l.dtype, sharding=shard_for(l))
            for l in example_leaves
        ]
    else:
        specs = [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in example_leaves]
    exported = jexport.export(jax.jit(flat_fn), platforms=tuple(platforms))(*specs)
    return exported.serialize()


def deserialize_runner(
    data: bytes, cfg: PipelineConfig, num_frames: int, batch: int = 1, dp: int = 1
):
    """bytes -> callable(state, inputs) -> (state', outputs).

    ``cfg``/``num_frames``/``batch``/``dp`` must match the exporting call;
    the exported signature rejects mismatched leaf shapes with a clear
    error.  With ``dp > 1`` every input leaf is committed to the lane
    sharding before the call (a dp-device artifact refuses to run in a
    single-device context otherwise).
    """
    from jax import export as jexport

    exported = jexport.deserialize(data)
    _, _, in_tree, out_tree = _flat_runner(cfg, num_frames, batch=batch)
    place = None
    if dp > 1:
        _, shard_for = lane_sharding(dp)
        place = lambda leaf: jax.device_put(leaf, shard_for(leaf))  # noqa: E731

    def run(state, inputs):
        leaves = jax.tree_util.tree_flatten((state, inputs))[0]
        if place is not None:
            leaves = [place(l) for l in leaves]
        out_leaves = exported.call(*leaves)
        return jax.tree_util.tree_unflatten(out_tree, out_leaves)

    return run


def save_exported(path: str, data: bytes) -> None:
    with open(path, "wb") as f:
        f.write(data)


def load_exported(path: str) -> bytes:
    with open(path, "rb") as f:
        return f.read()
