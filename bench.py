#!/usr/bin/env python
"""End-to-end pipeline benchmark.

Measures the BASELINE.json headline: frames/sec/chip for the
detect->track->estimate->plan pipeline over the 300-frame synthetic demo
sequence, as one jitted `lax.scan` program on a single chip.  Tagging is
disabled to match the reference's headline configuration (demo.py never
tags); `benchmarks/suite.py` reports the tagging-on variant separately.

Timing methodology (tunnel-attached TPU runtimes are hostile to naive
timing — see benchmarks/suite.py): the jitted benchmark function runs the
300-frame scan REPS times back-to-back (each rep data-chained on the
previous digest so XLA cannot hoist it), folds a fresh nonce into every
call (defeats same-arguments result caching), and returns one device-side
scalar digest of all outputs whose `float()` readback ends the timer
(defeats async dispatch resolving block_until_ready early).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` is measured FPS divided by the reference's published headline
(45.2 FPS end-to-end on CPU, /root/reference/README.md:141 sample output —
the only number the reference publishes; see BASELINE.md).
"""

import json
import subprocess
import sys
import time

REFERENCE_FPS = 45.2  # README.md:141 sample console output
NUM_FRAMES = 300
REPS = 20  # scans per dispatch (amortizes the ~35 ms tunnel dispatch floor)
REPEATS = 10
DEVICE_PROBE_TIMEOUT_S = 300.0


def _probe_device(attempts: int = 2) -> str | None:
    """Return the default platform, or None if the backend is unreachable.

    The tunnel-attached TPU runtime hangs *indefinitely* inside PJRT client
    init when the tunnel is down (observed 2026-08-18: >240 s with no error),
    and that hang is inside a C call no signal can interrupt.  Probing in a
    subprocess with a hard timeout turns an infinite bench hang into a fast,
    honest failure.  A healthy backend answers in a few seconds; one retry
    rides out a transient tunnel flap without masking a real outage.
    """
    for attempt in range(attempts):
        platform = _probe_device_once()
        if platform is not None:
            return platform
        if attempt + 1 < attempts:
            print(
                f"# device probe attempt {attempt + 1} failed; retrying",
                file=sys.stderr,
            )
    return None


def _probe_device_once() -> str | None:
    try:
        proc = subprocess.run(
            # Re-apply JAX_PLATFORMS over the config: this environment's
            # sitecustomize registers the axon backend with
            # jax.config.update("jax_platforms", "axon,cpu"), which overrides
            # the env var — an explicit JAX_PLATFORMS=cpu must still win.
            [
                sys.executable,
                "-c",
                "import os, jax\n"
                "p = os.environ.get('JAX_PLATFORMS')\n"
                "if p: jax.config.update('jax_platforms', p)\n"
                "print(jax.devices()[0].platform)",
            ],
            capture_output=True,
            text=True,
            timeout=DEVICE_PROBE_TIMEOUT_S,
        )
    except subprocess.TimeoutExpired:
        return None
    if proc.returncode != 0:
        return None
    return proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else None


def main():
    from pathlib import Path as _P

    platform = _probe_device()
    if platform is None:
        print(
            f"# device backend unreachable after {DEVICE_PROBE_TIMEOUT_S:.0f}s "
            "probe (TPU tunnel down?) — refusing to hang",
            file=sys.stderr,
        )
        print(
            json.dumps(
                {
                    "metric": "e2e_frames_per_sec_per_chip",
                    "value": None,
                    "unit": "frames/s",
                    "vs_baseline": None,
                    "error": "device backend unreachable "
                    f"(probe timeout {DEVICE_PROBE_TIMEOUT_S:.0f}s)",
                }
            )
        )
        sys.exit(1)
    print(f"# device probe ok: platform={platform}", file=sys.stderr)

    import jax
    import jax.numpy as jnp

    from multimodal_autonomous_driving_perception_and_planning_tpu.utils.platform import (
        apply_platform_env,
    )

    # See _probe_device: the axon registration overrides the env var.
    apply_platform_env()

    _c = _P.home() / ".cache" / "madpp_jax"
    _c.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(_c))
    # Threshold must be 0 on this runtime: the tunnel backend compiles
    # asynchronously server-side, so the client-observed compile time is
    # ~1 s even for the 300-frame scan (the real 1-4 min wait happens at
    # first execution) — any positive threshold skips exactly the
    # programs worth caching.  A hit cuts the compile stage from
    # 160-240 s to ~1 s; what remains is the server-side program load at
    # first execution (~35-75 s/process).  benchmarks/ANALYSIS.md §5.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    sys.path.insert(0, str(_P(__file__).resolve().parent / "benchmarks"))
    from suite import _pipeline_inputs, _scan_bench_fn, _time_digest

    from multimodal_autonomous_driving_perception_and_planning_tpu import (
        DEFAULT_CONFIG,
    )

    # Match the reference headline's configuration: demo.py runs
    # detect->track->estimate->plan with NO tagging (SURVEY.md L7 — tagging
    # only runs in the Streamlit app).  benchmarks/suite.py reports the
    # tagging-on variant separately.  Output volume is the serving tier's
    # (apps/serve.py _OUTPUT_KEYS): best plan + track summaries; the
    # viz-only candidate tensors and trajectory rings are opt-in
    # (PipelineConfig.emit_*) and cost more to stack than the frame costs
    # to compute.
    cfg = DEFAULT_CONFIG.replace(
        use_frames=False,
        enable_tagging=False,
        emit_candidates=False,
        emit_trajectories=False,
    )
    inputs = _pipeline_inputs(NUM_FRAMES)
    f = _scan_bench_fn(cfg, REPS)

    print(
        "# compiling the 300-frame scan (first-ever run ~2-7 min on this "
        "runtime; persistent cache makes later runs start in seconds)...",
        file=sys.stderr,
        flush=True,
    )
    t0 = time.perf_counter()
    float(f(jnp.float32(0.0), inputs))  # compile + warm
    compile_s = time.perf_counter() - t0

    best, p50 = _time_digest(f, inputs, repeats=REPEATS)
    total = NUM_FRAMES * REPS
    fps = total / best
    per_frame_us = best / total * 1e6

    print(
        f"# device={jax.devices()[0]} compile={compile_s:.1f}s "
        f"seq={NUM_FRAMES}f x {REPS} reps best={best*1e3:.2f}ms "
        f"p50={p50*1e3:.2f}ms ({per_frame_us:.1f}us/frame)",
        file=sys.stderr,
    )
    print(
        "# config note: this is the SERVING-volume output set (best plan + "
        "track summaries, emit_candidates/emit_trajectories off). The "
        "reference demo also draws candidate trajectories each frame; the "
        "apples-to-apples demo-volume number is benchmarks/suite.py's "
        "e2e_demo_outputs_fps.",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "e2e_frames_per_sec_per_chip",
                "value": round(fps, 1),
                "unit": "frames/s",
                "vs_baseline": round(fps / REFERENCE_FPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
