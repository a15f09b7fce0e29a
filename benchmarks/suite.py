#!/usr/bin/env python
"""Benchmark suite: one JSON line per BASELINE.json config.

  1. single synthetic frame, fused step latency (p50)
  2. 300-frame scanned sequence, frames/s/chip  (== bench.py headline)
  3. YOLO-mode detection on batched 640x640 frames with TPU NMS
  4. dense traffic: 64+ concurrent tracks, batched IoU + Kalman
  5. multi-camera: 8 feeds vmapped through the full stack
  6. frames mode: full image stack (Canny + matmul-Hough lanes + scene
     features) per frame, scanned

Run: python benchmarks/suite.py [--quick]
"""

import argparse
import sys
from pathlib import Path as _Path

sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def _setup_cache():
    cache = Path.home() / ".cache" / "madpp_jax"
    cache.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def _time(fn, repeats):
    fn()  # compile + warm
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return float(np.min(times)), float(np.median(times))


def emit(name, value, unit, **extra):
    print(json.dumps({"metric": name, "value": round(value, 2), "unit": unit, **extra}))


def bench_single_step(repeats):
    from multimodal_autonomous_driving_perception_and_planning_tpu import (
        DEFAULT_CONFIG,
        initial_state,
        make_pipeline_step,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.data.synthetic import (
        simulated_detection_stream,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.pipeline import (
        detections_from_arrays,
    )

    cfg = DEFAULT_CONFIG.replace(use_frames=False, enable_tagging=True)
    step = jax.jit(make_pipeline_step(cfg))
    state = initial_state(cfg)
    frame0 = {k: v[0] for k, v in simulated_detection_stream(1).items()}
    inputs = {
        "detections": detections_from_arrays(frame0),
        "ego_measurement": jnp.asarray([0.33, 0.0, 10.0, 0.0], jnp.float32),
    }

    def run():
        s, out = step(state, inputs)
        jax.block_until_ready(out["plan_best"])

    best, p50 = _time(run, repeats)
    emit("single_frame_step_latency_p50", p50 * 1e6, "us", best_us=round(best * 1e6, 1))


def _make_inputs(num_frames, capacity=16, dets=None):
    from multimodal_autonomous_driving_perception_and_planning_tpu.data.synthetic import (
        ego_motion_stream,
        simulated_detection_stream,
    )

    dets = dets or simulated_detection_stream(num_frames, capacity=capacity)
    ego = ego_motion_stream(num_frames, dt=1.0 / 30.0, seed=0)
    inputs = {k: jnp.asarray(v) for k, v in dets.items()}
    inputs["ego_measurement"] = jnp.asarray(ego, jnp.float32)
    return jax.device_put(inputs)


def bench_sequence(repeats, num_frames=300):
    from multimodal_autonomous_driving_perception_and_planning_tpu import (
        DEFAULT_CONFIG,
        initial_state,
        make_sequence_runner,
    )

    cfg = DEFAULT_CONFIG.replace(use_frames=False, enable_tagging=True)
    run = make_sequence_runner(cfg, donate=False)
    inputs = _make_inputs(num_frames)

    def go():
        _, outs = run(initial_state(cfg), inputs)
        jax.block_until_ready(outs["plan_best"])

    best, p50 = _time(go, repeats)
    emit(
        "e2e_frames_per_sec_per_chip",
        num_frames / best,
        "frames/s",
        p50_ms=round(p50 * 1e3, 2),
        vs_baseline=round(num_frames / best / 45.2, 2),
    )


def bench_yolo(repeats, batch=64):
    """Streaming detection throughput: one dispatch processes a 64-frame
    clip (bf16 convs on the MXU).  Large dispatches amortize the host
    dispatch overhead the same way the scan runner does for the pipeline."""
    from multimodal_autonomous_driving_perception_and_planning_tpu.models.yolov8 import (
        make_yolo_detector,
    )

    init_fn, detect_fn = make_yolo_detector(max_det=32)
    variables = init_fn(jax.random.PRNGKey(0))
    frames = jnp.zeros((batch, 640, 640, 3), jnp.float32)
    vdetect = jax.jit(jax.vmap(lambda f: detect_fn(variables, f)))

    def go():
        out = vdetect(frames)
        jax.block_until_ready(out["bbox"])

    best, p50 = _time(go, repeats)
    emit(
        "yolov8n_detect_fps_640",
        batch / best,
        "frames/s",
        batch=batch,
        p50_ms_per_batch=round(p50 * 1e3, 2),
    )


def bench_dense_traffic(repeats, num_frames=100):
    from multimodal_autonomous_driving_perception_and_planning_tpu import (
        DEFAULT_CONFIG,
        initial_state,
        make_sequence_runner,
    )

    cfg = DEFAULT_CONFIG.replace(use_frames=False, enable_tagging=True)
    cfg = cfg.replace(
        detector=cfg.detector.__class__(max_detections=64),
        tracker=cfg.tracker.__class__(max_tracks=128),
    )
    # 64 persistent agents per frame on a grid (worst-case association load).
    rng = np.random.default_rng(0)
    T, D = num_frames, 64
    base = np.zeros((D, 4), np.float32)
    gx, gy = np.meshgrid(np.arange(8), np.arange(8))
    base[:, 0] = gx.reshape(-1) * 78
    base[:, 1] = gy.reshape(-1) * 58
    base[:, 2] = base[:, 0] + 70
    base[:, 3] = base[:, 1] + 50
    drift = rng.normal(0, 1.5, (T, D, 1)).astype(np.float32)
    bbox = base[None] + np.concatenate([drift, drift, drift, drift], axis=2)
    dets = {
        "bbox": bbox,
        "class_id": np.zeros((T, D), np.int32),
        "confidence": np.full((T, D), 0.9, np.float32),
        "valid": np.ones((T, D), bool),
    }
    run = make_sequence_runner(cfg, donate=False)
    inputs = _make_inputs(T, dets=dets)

    def go():
        _, outs = run(initial_state(cfg), inputs)
        jax.block_until_ready(outs["plan_best"])

    best, p50 = _time(go, repeats)
    emit(
        "dense_traffic_64agents_fps",
        T / best,
        "frames/s",
        tracks=64,
        p50_ms=round(p50 * 1e3, 2),
    )


def bench_frames(repeats, num_frames=120):
    """Video-fidelity config: the pipeline consumes real camera frames, so
    every per-frame step runs gray/blur/Canny + two Hough passes + scene
    features on device inside the scan."""
    from multimodal_autonomous_driving_perception_and_planning_tpu import (
        DEFAULT_CONFIG,
        initial_state,
        make_sequence_runner,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.data.frames import (
        SyntheticRoadGenerator,
    )

    cfg = DEFAULT_CONFIG.replace(use_frames=True, enable_tagging=True)
    frames = SyntheticRoadGenerator().generate_frames(num_frames)
    inputs = _make_inputs(num_frames)
    inputs["frame"] = jnp.asarray(frames)
    run = make_sequence_runner(cfg, donate=False)

    def go():
        _, outs = run(initial_state(cfg), inputs)
        jax.block_until_ready(outs["plan_best"])

    best, p50 = _time(go, repeats)
    emit(
        "frames_mode_fps",
        num_frames / best,
        "frames/s",
        p50_ms=round(p50 * 1e3, 2),
        us_per_frame=round(best / num_frames * 1e6, 1),
    )


def bench_multicamera(repeats, cams=8, num_frames=100):
    from multimodal_autonomous_driving_perception_and_planning_tpu import (
        DEFAULT_CONFIG,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.parallel.mesh import (
        make_camera_mesh,
        make_multicamera_runner,
        stack_states,
    )

    cfg = DEFAULT_CONFIG.replace(use_frames=False, enable_tagging=True)
    n_dev = len(jax.devices())
    mesh = make_camera_mesh(n_dev)
    runner = make_multicamera_runner(cfg, mesh)
    states = stack_states(cfg, cams)
    one = _make_inputs(num_frames)

    def rep(x):
        return jnp.broadcast_to(x, (cams,) + x.shape)

    inputs = {k: rep(v) for k, v in one.items()}

    def go():
        _, outs, fleet = runner(states, inputs)
        jax.block_until_ready(fleet["fleet_confirmed_per_frame"])

    best, p50 = _time(go, repeats)
    emit(
        "multicamera_8feed_agg_fps",
        cams * num_frames / best,
        "frames/s",
        cameras=cams,
        devices=n_dev,
        p50_ms=round(p50 * 1e3, 2),
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    args = parser.parse_args()
    repeats = 3 if args.quick else 10

    _setup_cache()
    print(f"# device: {jax.devices()}", flush=True)
    bench_single_step(repeats)
    bench_sequence(repeats)
    bench_yolo(repeats)
    bench_dense_traffic(repeats)
    bench_multicamera(repeats)
    bench_frames(repeats)


if __name__ == "__main__":
    main()
