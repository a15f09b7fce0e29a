#!/usr/bin/env python
"""End-to-end pipeline benchmark.

Measures the BASELINE.json headline: frames/sec/chip for the full
detect->track->estimate->plan pipeline over the 300-frame synthetic demo
sequence, as one jitted `lax.scan` program on a single chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` is measured FPS divided by the reference's published headline
(45.2 FPS end-to-end on CPU, /root/reference/README.md:141 sample output —
the only number the reference publishes; see BASELINE.md).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_autonomous_driving_perception_and_planning_tpu import (
    DEFAULT_CONFIG,
    initial_state,
    make_sequence_runner,
)
from multimodal_autonomous_driving_perception_and_planning_tpu.data.synthetic import (
    ego_motion_stream,
    simulated_detection_stream,
)

REFERENCE_FPS = 45.2  # README.md:141 sample console output
NUM_FRAMES = 300
REPEATS = 20


def main():
    import jax as _jax
    from pathlib import Path as _P
    _c = _P.home() / ".cache" / "madpp_jax"
    _c.mkdir(parents=True, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", str(_c))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    cfg = DEFAULT_CONFIG.replace(use_frames=False, enable_tagging=True)
    dets = simulated_detection_stream(NUM_FRAMES)
    ego = ego_motion_stream(NUM_FRAMES, dt=1.0 / 30.0, seed=0)
    inputs = {
        "bbox": jnp.asarray(dets["bbox"]),
        "class_id": jnp.asarray(dets["class_id"]),
        "confidence": jnp.asarray(dets["confidence"]),
        "valid": jnp.asarray(dets["valid"]),
        "ego_measurement": jnp.asarray(ego, jnp.float32),
    }
    inputs = jax.device_put(inputs)
    run = make_sequence_runner(cfg, donate=False)

    # Warmup / compile.
    t0 = time.perf_counter()
    final, outs = run(initial_state(cfg), inputs)
    jax.block_until_ready(outs["plan_best"])
    compile_s = time.perf_counter() - t0

    times = []
    for _ in range(REPEATS):
        state = initial_state(cfg)
        t0 = time.perf_counter()
        final, outs = run(state, inputs)
        jax.block_until_ready(outs["plan_best"])
        times.append(time.perf_counter() - t0)

    times = np.asarray(times)
    best = times.min()
    p50 = float(np.median(times))
    fps = NUM_FRAMES / best
    per_frame_ms = best / NUM_FRAMES * 1e3

    print(
        f"# device={jax.devices()[0]} compile={compile_s:.1f}s "
        f"seq={NUM_FRAMES}f best={best*1e3:.2f}ms p50={p50*1e3:.2f}ms "
        f"({per_frame_ms*1e3:.1f}us/frame)",
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
