"""Kernel-vs-XLA dispatch shared by every Pallas-accelerated op.

Every hot op in this library has two bit-identical formulations: a Mosaic
(Pallas) kernel for TPU and an XLA formulation that is the CPU path, the
frames-mode path, and the equivalence oracle.  Selection rules:

* ``backend=None`` (the default, and what the pipeline passes): the choice
  is made **at lowering time** via :func:`jax.lax.platform_dependent` —
  "tpu" lowers the kernel, anything else lowers the XLA branch.  This is
  what makes cross-host AOT export correct: a TPU serving artifact
  produced on a CPU-only host (``utils/export.py``, platforms=("tpu",...))
  still contains the fused kernels, and a multi-platform artifact carries
  per-platform code selected just before compilation.  For an ordinary
  single-platform ``jit`` the choice is resolved during lowering — the
  compiler never sees a conditional (no runtime cost).
* ``backend="tpu"``/``"cpu"``: trace-time override for callers that need a
  specific formulation regardless of lowering platform — the benchmark
  suite's kernel-vs-XLA comparisons and the on-TPU parity probes
  (tools/tpu_checks.py) force the XLA path *on the TPU* this way.

Both branches are traced (platform_dependent stages both into the jaxpr),
so they must return identical pytree structures/shapes/dtypes — guaranteed
here because each kernel is fuzz-tested bit-identical to its XLA oracle
(tests/test_*_pallas.py).
"""

from __future__ import annotations

import os
from typing import Any, Callable

import jax

ENV_BACKEND = "MADPP_DISPATCH_BACKEND"


def env_backend() -> str | None:
    """The process-wide dispatch pin from the environment, or None.

    Read at trace time.  Used in place of a ``backend=None`` default both
    here and by step factories that skip building the kernel branch
    entirely when a non-TPU formulation is pinned (tagging/rules.py)."""
    return os.environ.get(ENV_BACKEND) or None


def kernel_or_xla(
    kernel_fn: Callable[..., Any],
    xla_fn: Callable[..., Any],
    *args: Any,
    backend: str | None = None,
):
    """Dispatch ``*args`` to the Mosaic kernel or the XLA formulation.

    ``backend=None`` -> lowering-time platform choice (kernel on "tpu",
    XLA elsewhere); ``backend="tpu"`` -> kernel now; anything else -> XLA
    now.  Positional ``*args`` may be pytrees; static parameters should be
    closed over in the two callables.

    ``MADPP_DISPATCH_BACKEND`` (env, read at trace time) substitutes for a
    ``backend=None`` default — platform_dependent stages BOTH branches
    into the jaxpr, and on a CPU-only host that doubles trace work for a
    branch that can never lower; the test conftest pins "cpu" to keep the
    suite fast.  An explicit ``backend`` argument always wins.
    """
    if backend is None:
        backend = env_backend()
    if backend is None:
        return jax.lax.platform_dependent(*args, tpu=kernel_fn, default=xla_fn)
    if backend == "tpu":
        return kernel_fn(*args)
    return xla_fn(*args)
