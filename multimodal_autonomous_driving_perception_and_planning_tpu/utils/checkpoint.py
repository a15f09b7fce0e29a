"""Checkpoint / resume of the pipeline scan carry.

The reference has no pipeline checkpointing — state is reset, never
restored (SURVEY.md section 5).  Here the entire cross-frame state (track
table, Kalman state, lane EMA, tagging histories, frame counter) is one
pytree, so orbax can save/restore it and long video runs resume exactly
where they stopped.
"""

from __future__ import annotations

from pathlib import Path

import jax


def save_pipeline_state(path: str, state) -> None:
    """Save a PipelineState (or any pytree of arrays) atomically."""
    import orbax.checkpoint as ocp

    p = Path(path).resolve()
    with ocp.StandardCheckpointer() as ckpt:
        ckpt.save(p, state, force=True)


def restore_pipeline_state(path: str, template):
    """Restore into the shapes/dtypes of `template` (e.g. initial_state(cfg))."""
    import orbax.checkpoint as ocp

    p = Path(path).resolve()
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), template
    )
    with ocp.StandardCheckpointer() as ckpt:
        return ckpt.restore(p, abstract)
