#!/usr/bin/env python
"""On-TPU validation probes for the round-4 kernels.

Each probe runs the real Mosaic lowering (not the interpreter) and checks
bit-equality against the XLA formulation executed in the same process, or
bounds a compile time that used to be pathological.  Run one probe per
process (CLAUDE.md rule: one TPU process at a time):

  python tools/tpu_checks.py tracker     # fused tracker kernel parity
  python tools/tpu_checks.py nms         # NMS keep-mask parity + vmap
  python tools/tpu_checks.py yolos       # yolov8s full detect+NMS compile
  python tools/tpu_checks.py yolom       # yolov8m full detect+NMS compile
  python tools/tpu_checks.py yolol       # yolov8l full detect+NMS compile
  python tools/tpu_checks.py yolox       # yolov8x full detect+NMS compile
  python tools/tpu_checks.py dispatch    # default lowering picks the kernels
  python tools/tpu_checks.py scan        # 300-frame scan: kernel vs XLA ids
  python tools/tpu_checks.py scene       # reduced scene pass: tag parity on TPU
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _cache():
    import jax

    c = Path.home() / ".cache" / "madpp_jax"
    c.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(c))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def check_tracker() -> None:
    """Kernel vs XLA path, both on TPU, multi-step stream, every field."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodal_autonomous_driving_perception_and_planning_tpu.config import (
        TrackerConfig,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.ops.tracker_pallas import (
        tracker_update_pallas,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.tracking.tracker import (
        tracker_update,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.types import (
        Detections,
        TrackTable,
    )

    for t_cap, d_cap in ((64, 16), (128, 64)):
        cfg = TrackerConfig(iou_threshold=0.1, max_age=2, min_hits=3,
                            max_tracks=t_cap, trajectory_length=6)
        rng = np.random.default_rng(t_cap)
        kernel_step = jax.jit(
            lambda tb, d: tracker_update_pallas(tb, d, cfg)  # noqa: B023
        )
        xla_step = jax.jit(
            lambda tb, d: tracker_update(tb, d, cfg, backend="cpu")  # noqa: B023
        )
        a = TrackTable.empty(t_cap, 6)
        b = TrackTable.empty(t_cap, 6)
        for step in range(10):
            cx = np.round(rng.uniform(0, 600, d_cap) / 20) * 20
            cy = np.round(rng.uniform(0, 400, d_cap) / 20) * 20
            w = np.round(rng.uniform(30, 150, d_cap) / 20) * 20
            h = np.round(rng.uniform(30, 150, d_cap) / 20) * 20
            dets = Detections(
                bbox=jnp.asarray(
                    np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], 1),
                    jnp.float32,
                ),
                class_id=jnp.asarray(rng.integers(0, 8, d_cap), jnp.int32),
                confidence=jnp.asarray(rng.uniform(0.5, 1, d_cap), jnp.float32),
                valid=jnp.asarray(rng.random(d_cap) < 0.6),
            )
            a, ma, oa, na = kernel_step(a, dets)
            b, mb = xla_step(b, dets)
            np.testing.assert_array_equal(np.asarray(ma), np.asarray(mb))
            from multimodal_autonomous_driving_perception_and_planning_tpu.tracking.tracker import (  # noqa: E501
                confirmed_order,
            )

            ob, nb = confirmed_order(b, cfg.min_hits)
            np.testing.assert_array_equal(np.asarray(oa), np.asarray(ob))
            assert int(na) == int(nb)
            for f in ("track_id", "bbox", "class_id", "confidence", "age",
                      "hits", "misses", "trajectory", "traj_len", "velocity",
                      "vel_count", "next_id"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(a, f)), np.asarray(getattr(b, f)),
                    err_msg=f"({t_cap},{d_cap}) step {step} field {f}",
                )
        # vmap (multicamera) lowering check.
        stack_t = jax.tree_util.tree_map(
            lambda x: jnp.stack([x, x]), TrackTable.empty(t_cap, 6)
        )
        stack_d = jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), dets)
        vt, vm, vo, vn = jax.jit(jax.vmap(
            lambda tb, d: tracker_update_pallas(tb, d, cfg)  # noqa: B023
        ))(stack_t, stack_d)
        np.testing.assert_array_equal(np.asarray(vm)[0], np.asarray(vm)[1])
        print(f"tracker ({t_cap},{d_cap}) ok (10 steps bit-identical + vmap)")


def check_nms() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodal_autonomous_driving_perception_and_planning_tpu.ops.nms import (
        nms_keep_xla,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.ops.nms_pallas import (
        nms_keep_pallas,
    )

    rng = np.random.default_rng(0)
    for k in (64, 256):
        for trial in range(5):
            cx = np.round(rng.uniform(0, 300, k) / 10) * 10
            cy = np.round(rng.uniform(0, 200, k) / 10) * 10
            w = np.round(rng.uniform(20, 120, k) / 10) * 10
            h = np.round(rng.uniform(20, 120, k) / 10) * 10
            boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], 1)
            scores = np.sort(rng.uniform(0, 1, k).astype(np.float32))[::-1].copy()
            bj = jnp.asarray(boxes, jnp.float32)
            sj = jnp.asarray(scores)
            got = np.asarray(jax.jit(
                lambda b, s: nms_keep_pallas(b, s, 0.45)
            )(bj, sj))
            # Bit-for-bit keep-mask equality vs the XLA fixpoint executed
            # on the same device with the same f32 IoU math — a set of
            # rounded kept scores would drop multiplicity/position and
            # could false-pass exactly the tie-break divergences the
            # quantized boxes are built to provoke.
            want = np.asarray(jax.jit(
                lambda b, s: nms_keep_xla(b, s, 0.45)
            )(bj, sj))
            np.testing.assert_array_equal(got, want, err_msg=f"k={k} trial={trial}")
        print(f"nms k={k} ok")
    # vmap lowering (batched detection frontend).
    B = 4
    boxes = jnp.asarray(rng.uniform(0, 300, (B, 64, 4)).astype(np.float32))
    scores = jnp.asarray(
        np.sort(rng.uniform(0, 1, (B, 64)).astype(np.float32), axis=1)[:, ::-1].copy()
    )
    out = jax.jit(jax.vmap(lambda b, s: nms_keep_pallas(b, s, 0.45)))(boxes, scores)
    print("nms vmap ok", np.asarray(out).shape)


def check_yolo_variant(variant: str, budget_s: float = 600.0) -> None:
    """Full detect+NMS compile for a wide variant must fit the budget
    (used to be >35 min with the XLA NMS fixpoint)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodal_autonomous_driving_perception_and_planning_tpu.models.yolov8 import (
        make_yolo_detector,
    )

    batch = {"s": 16, "m": 8, "l": 4, "x": 4}.get(variant, 16)
    init_fn, detect_fn = make_yolo_detector(variant=variant, max_det=32)
    variables = init_fn(jax.random.PRNGKey(0))
    frames = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (batch, 640, 640, 3))
        .astype(np.float32)
    )
    f = jax.jit(lambda v, x: jax.vmap(detect_fn, in_axes=(None, 0))(v, x))
    t0 = time.time()
    out = f(variables, frames)
    jax.block_until_ready(out["bbox"])
    dt = time.time() - t0
    print(f"yolov8{variant} full detect+NMS batch={batch}: "
          f"compile+first-exec {dt:.1f}s (budget {budget_s:.0f}s)")
    assert dt < budget_s, f"compile pathology not fixed: {dt:.0f}s"
    t0 = time.time()
    out = f(variables, frames + 1.0)
    jax.block_until_ready(out["bbox"])
    print(f"steady-state batch latency {time.time()-t0:.3f}s")


def check_scan() -> None:
    """300-frame scan: fused tracker kernel vs XLA path, track ids
    bit-identical (the reference-diff contract, on TPU)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import multimodal_autonomous_driving_perception_and_planning_tpu.pipeline as pipeline
    from multimodal_autonomous_driving_perception_and_planning_tpu import (
        DEFAULT_CONFIG,
        initial_state,
        make_sequence_runner,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.data.synthetic import (
        ego_motion_stream,
        simulated_detection_stream,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.tracking.tracker import (
        tracker_update_with_order,
    )

    cfg = DEFAULT_CONFIG.replace(use_frames=False, enable_tagging=True)
    n = 300
    dets = simulated_detection_stream(n)
    ego = ego_motion_stream(n, seed=0)
    inputs = {k: jnp.asarray(v) for k, v in dets.items()}
    inputs["ego_measurement"] = jnp.asarray(ego, jnp.float32)

    run = make_sequence_runner(cfg, donate=False)
    _, outs_kernel = run(initial_state(cfg), outs_inputs := inputs)

    orig = pipeline.tracker_update_with_order
    pipeline.tracker_update_with_order = (
        lambda t, d, c, mh, backend=None: tracker_update_with_order(
            t, d, c, mh, backend="cpu"
        )
    )
    try:
        run_xla = make_sequence_runner(cfg, donate=False)
        _, outs_xla = run_xla(initial_state(cfg), outs_inputs)
    finally:
        pipeline.tracker_update_with_order = orig

    np.testing.assert_array_equal(
        np.asarray(outs_kernel["track_id"]), np.asarray(outs_xla["track_id"])
    )
    np.testing.assert_array_equal(
        np.asarray(outs_kernel["confirmed_order"]),
        np.asarray(outs_xla["confirmed_order"]),
    )
    np.testing.assert_array_equal(
        np.asarray(outs_kernel["match"]), np.asarray(outs_xla["match"])
    )
    for k in ("track_bbox", "track_velocity"):
        np.testing.assert_array_equal(
            np.asarray(outs_kernel[k]), np.asarray(outs_xla[k]), err_msg=k
        )
    print("scan ok: 300-frame track ids/match/bbox bit-identical, kernel vs XLA")


def check_scene() -> None:
    """Reduced scene-feature pass vs the full-resolution reference-style
    pass, both on TPU: road-type tags (and the thresholded conditions)
    must be exactly equal over the synthetic road stream.  This is the
    on-device twin of tests/test_lanes.py::test_reduced_scene_pass_tag_
    equivalent — TPU matmul/accumulation numerics must not move any
    thresholded feature across its threshold (scene_classifier.py:145-207
    consumes booleans)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodal_autonomous_driving_perception_and_planning_tpu import (
        DEFAULT_CONFIG,
        initial_state,
        make_sequence_runner,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.data.frames import (
        SyntheticRoadGenerator,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.data.synthetic import (
        ego_motion_stream,
        simulated_detection_stream,
    )

    n = 40
    base = DEFAULT_CONFIG.replace(use_frames=True, enable_tagging=True)
    assert base.lanes.scene_downsample == 2 and not base.lanes.scene_refine
    full_lanes = base.lanes.__class__(
        **{**base.lanes.__dict__, "scene_downsample": 1, "scene_refine": True}
    )
    full = base.replace(lanes=full_lanes)

    gen = SyntheticRoadGenerator(base.frame_width, base.frame_height)
    frames = gen.generate_frames(n)
    dets = simulated_detection_stream(n)
    ego = ego_motion_stream(n, seed=0)
    inputs = {k: jnp.asarray(v) for k, v in dets.items()}
    inputs["ego_measurement"] = jnp.asarray(ego, jnp.float32)
    inputs["frame"] = jnp.asarray(np.ascontiguousarray(frames, np.uint8))

    outs = {}
    for name, cfg in (("reduced", base), ("full", full)):
        t0 = time.time()
        run = make_sequence_runner(cfg, donate=False)
        _, o = run(initial_state(cfg), inputs)
        outs[name] = jax.tree_util.tree_map(np.asarray, o)
        print(f"  {name} pass: {time.time() - t0:.1f}s incl. compile")

    r, fl = outs["reduced"]["tags"], outs["full"]["tags"]
    np.testing.assert_array_equal(r["road_type"], fl["road_type"])
    np.testing.assert_array_equal(r["road_type_raw"], fl["road_type_raw"])
    np.testing.assert_allclose(
        r["road_type_confidence"], fl["road_type_confidence"], atol=1e-6
    )
    for k in ("cond_night", "cond_day", "cond_congested", "cond_clear", "cond_fog"):
        np.testing.assert_array_equal(r[k], fl[k], err_msg=k)
    np.testing.assert_array_equal(
        outs["reduced"]["lane_obs"].left_fit, outs["full"]["lane_obs"].left_fit
    )
    print(
        "scene ok: reduced pass tag-identical to the full pass on "
        + jax.default_backend()
    )


def check_dispatch() -> None:
    """Lowering-time dispatch sanity on the real runtime: a default-backend
    jit of a kernel_or_xla op must lower to the Mosaic kernel (the tunnel
    backend's lowering platform must be "tpu" for ops.dispatch's
    platform_dependent to select the kernels).  Runs in seconds; run it
    FIRST after any dispatch-layer change."""
    import jax
    import jax.numpy as jnp

    from multimodal_autonomous_driving_perception_and_planning_tpu.ops.association import (
        greedy_associate,
    )

    assert jax.default_backend() == "tpu", jax.default_backend()
    iou = jnp.zeros((64, 16), jnp.float32)
    rank = jnp.zeros((64,), jnp.int32)
    hlo = jax.jit(lambda i, r: greedy_associate(i, r, 0.3)).lower(iou, rank)
    text = hlo.as_text()
    assert "tpu_custom_call" in text or "mosaic" in text.lower(), (
        "default-backend lowering did NOT select the Mosaic kernel — "
        "the lowering platform is not 'tpu'; ops/dispatch.py needs an "
        "explicit branch for it"
    )
    print("dispatch ok: default lowering selects the Mosaic kernel")


def main() -> int:
    from multimodal_autonomous_driving_perception_and_planning_tpu.utils.platform import (
        apply_platform_env,
    )

    apply_platform_env()
    _cache()
    which = sys.argv[1] if len(sys.argv) > 1 else "tracker"
    {
        "dispatch": check_dispatch,
        "tracker": check_tracker,
        "nms": check_nms,
        "yolos": lambda: check_yolo_variant("s"),
        "yolom": lambda: check_yolo_variant("m"),
        "yolol": lambda: check_yolo_variant("l"),
        "yolox": lambda: check_yolo_variant("x"),
        "scan": check_scan,
        "scene": check_scene,
    }[which]()
    return 0


if __name__ == "__main__":
    sys.exit(main())
