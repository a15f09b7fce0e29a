"""Restore standard ``JAX_PLATFORMS`` env semantics for CLI entry points.

This environment's sitecustomize registers the tunnel-attached TPU backend
("axon") and sets ``jax.config.jax_platforms = "axon,cpu"`` *via the config*,
which takes precedence over the ``JAX_PLATFORMS`` environment variable.  The
practical consequence: ``JAX_PLATFORMS=cpu python demo.py`` would still dial
the TPU tunnel — and hang indefinitely inside PJRT client init if the tunnel
is down (no error, not interruptible by signals; observed 2026-08-18).

Every CLI surface (bench.py, demo.py, app.py, benchmarks/suite.py, tools/*)
calls :func:`apply_platform_env` before first device use so an explicit
``JAX_PLATFORMS`` env setting wins again, matching documented JAX behavior.
Library code never calls this — embedding applications own their config.
"""

from __future__ import annotations

import os


def apply_platform_env() -> str | None:
    """If ``JAX_PLATFORMS`` is set in the environment, re-apply it over
    ``jax.config`` (which sitecustomize may have overridden).  Returns the
    applied value, or None when the env var is unset (config untouched —
    the registered default platform, i.e. the TPU, is used)."""
    platforms = os.environ.get("JAX_PLATFORMS")
    if not platforms:
        return None
    import jax

    jax.config.update("jax_platforms", platforms)
    return platforms
