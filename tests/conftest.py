"""Test configuration: force a virtual 8-device CPU platform.

Multi-chip sharding tests run on CPU devices per the standard JAX recipe
(the analog of testing multi-node without a cluster); single-chip numerics
are identical between CPU and TPU for the f32 state math used here (the
library pins float32 matmul precision where parity matters).

Note: this environment's sitecustomize registers an 'axon' TPU platform and
sets JAX_PLATFORMS=axon; the config.update below is required to actually
select CPU.
"""

import os

# Zero-egress environment: make transformers fail fast instead of hanging on
# hub downloads (the VLM tagger then exercises its fallback path).
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# Pin the kernel-vs-XLA dispatch to the XLA formulation (what a CPU
# lowering would select anyway): lax.platform_dependent stages BOTH
# branches into every jaxpr, and tracing the Mosaic kernels that can never
# lower here measurably slows the suite.  Tests that cover the
# lowering-time dispatch itself (AOT export kernel-presence) remove this
# with monkeypatch.delenv.
os.environ.setdefault("MADPP_DISPATCH_BACKEND", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
