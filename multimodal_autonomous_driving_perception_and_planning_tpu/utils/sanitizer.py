"""Numeric sanitizer: NaN/Inf detection hooks (SURVEY.md §5).

The reference has no sanitizers at all; crashes from bad numerics surface
as downstream cv2 draw errors.  Here the pure-functional core means one
choke point catches everything:

- ``nan_debug()`` — context manager (or env var ``MADPP_DEBUG_NANS=1`` at
  import, see ``enable_from_env``) that flips ``jax_debug_nans``: any NaN
  produced inside a jitted function raises ``FloatingPointError`` at the
  producing op, with XLA de-optimizing to locate it.
- ``validate_outputs(tree)`` — host-side post-hoc scan of a pipeline
  output pytree; raises ``ValueError`` naming every leaf path that
  contains NaN/Inf.  Cheap enough to run after every sequence scan when
  ``MADPP_VALIDATE_OUTPUTS=1``.
"""

from __future__ import annotations

import contextlib
import os

import jax
import numpy as np

ENV_DEBUG_NANS = "MADPP_DEBUG_NANS"
ENV_VALIDATE = "MADPP_VALIDATE_OUTPUTS"


@contextlib.contextmanager
def nan_debug(enable: bool = True):
    """Scope in which jitted computations raise on the first NaN produced."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", bool(enable))
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def enable_from_env() -> bool:
    """Turn on jax_debug_nans when MADPP_DEBUG_NANS=1; returns the state."""
    if os.environ.get(ENV_DEBUG_NANS, "") == "1":
        jax.config.update("jax_debug_nans", True)
        return True
    return False


def validate_outputs(tree, name: str = "outputs") -> None:
    """Raise ValueError listing every float leaf of ``tree`` holding a
    NaN or Inf; no-op on clean trees."""
    bad = []
    leaves = jax.tree_util.tree_leaves_with_path(tree)
    for path, leaf in leaves:
        arr = np.asarray(leaf)
        if not np.issubdtype(arr.dtype, np.floating):
            continue
        finite = np.isfinite(arr)
        if not finite.all():
            n_bad = int((~finite).sum())
            bad.append(f"{jax.tree_util.keystr(path)}: {n_bad}/{arr.size} non-finite")
    if bad:
        raise ValueError(f"non-finite values in {name}:\n  " + "\n  ".join(bad))


def validate_if_enabled(tree, name: str = "outputs") -> None:
    """`validate_outputs` gated on MADPP_VALIDATE_OUTPUTS=1."""
    if os.environ.get(ENV_VALIDATE, "") == "1":
        validate_outputs(tree, name)
