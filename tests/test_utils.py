"""Profiler / checkpoint / metrics utilities."""

import json
import time

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
from multimodal_autonomous_driving_perception_and_planning_tpu.utils import (
    FrameTimer,
    MetricsLogger,
    restore_pipeline_state,
    save_pipeline_state,
)


def _run(cfg, state, start, n):
    dets = simulated_detection_stream(n, start_frame_count=start + 1)
    ego = ego_motion_stream(start + n, seed=0)[start:]
    inputs = {k: jnp.asarray(v) for k, v in dets.items()}
    inputs["ego_measurement"] = jnp.asarray(ego, jnp.float32)
    run = make_sequence_runner(cfg, donate=False)
    return run(state, inputs)


def test_checkpoint_resume_is_exact(tmp_path):
    """Run 40 frames straight vs 20 + checkpoint/restore + 20: identical."""
    cfg = DEFAULT_CONFIG.replace(use_frames=False, enable_tagging=True)

    final_a, outs_a = _run(cfg, initial_state(cfg), 0, 40)

    mid, _ = _run(cfg, initial_state(cfg), 0, 20)
    ckpt = tmp_path / "ckpt"
    save_pipeline_state(str(ckpt), mid)
    restored = restore_pipeline_state(str(ckpt), initial_state(cfg))
    np.testing.assert_array_equal(
        np.asarray(mid.tracks.track_id), np.asarray(restored.tracks.track_id)
    )
    final_b, outs_b = _run(cfg, restored, 20, 20)

    np.testing.assert_array_equal(
        np.asarray(outs_a["track_id"])[20:], np.asarray(outs_b["track_id"])
    )
    np.testing.assert_allclose(
        np.asarray(outs_a["plan_costs"])[20:],
        np.asarray(outs_b["plan_costs"]),
        rtol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(final_a.tracks.next_id), np.asarray(final_b.tracks.next_id)
    )


def test_frame_timer_contract():
    t = FrameTimer(report_every=5)
    for i in range(10):
        with t:
            time.sleep(0.001)
        line = t.maybe_report(i, 10, extra="Tracks: 3")
        if i + 1 in (5, 10):
            assert line is not None and line.startswith(f"Frame {i+1}/10 | FPS:")
            assert "Tracks: 3" in line
        else:
            assert line is None
    assert t.fps > 0
    assert "Processed 10 frames" in t.summary()


def test_nan_debug_trips_on_injected_nan():
    """The sanitizer hook (SURVEY §5) raises at the producing op."""
    import jax
    import pytest

    from multimodal_autonomous_driving_perception_and_planning_tpu.utils import (
        nan_debug,
    )

    @jax.jit
    def bad(x):
        return jnp.log(x)  # log(-1) -> NaN

    with nan_debug():
        with pytest.raises(FloatingPointError):
            jax.block_until_ready(bad(jnp.asarray(-1.0)))
    # Outside the scope the same computation passes silently.
    assert np.isnan(float(bad(jnp.asarray(-1.0))))


def test_validate_outputs_names_bad_leaf(monkeypatch):
    import pytest

    from multimodal_autonomous_driving_perception_and_planning_tpu.utils import (
        validate_if_enabled,
        validate_outputs,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.utils.sanitizer import (
        ENV_VALIDATE,
    )

    clean = {"a": jnp.ones((3,)), "b": {"c": jnp.zeros((2, 2))}}
    validate_outputs(clean)  # no raise

    dirty = {"a": jnp.ones((3,)), "b": {"c": jnp.asarray([[1.0, np.nan], [np.inf, 0.0]])}}
    with pytest.raises(ValueError, match=r"\['b'\]\['c'\]"):
        validate_outputs(dirty, name="scan outputs")

    monkeypatch.setenv(ENV_VALIDATE, "0")
    validate_if_enabled(dirty)  # gated off -> no raise
    monkeypatch.setenv(ENV_VALIDATE, "1")
    with pytest.raises(ValueError):
        validate_if_enabled(dirty)


def test_metrics_logger_jsonl(tmp_path):
    path = tmp_path / "m.jsonl"
    log = MetricsLogger(str(path))
    log.log_frame(0, num_tracks=3, speed_kmh=36.0)
    log.log_frame(1, num_tracks=4, speed_kmh=37.0)
    log.close()
    rows = [json.loads(line) for line in path.read_text().splitlines()]
    assert rows[0]["frame"] == 0 and rows[1]["num_tracks"] == 4


def test_aot_export_round_trip(tmp_path):
    """jax.export serving artifact: serialize the whole scan runner,
    reload it, and get bit-identical outputs to the live jitted runner."""
    import jax
    import jax.numpy as jnp

    from multimodal_autonomous_driving_perception_and_planning_tpu import (
        DEFAULT_CONFIG,
        initial_state,
        make_sequence_runner,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.data.synthetic import (
        simulated_detection_stream,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.utils.export import (
        deserialize_runner,
        example_sequence_inputs,
        export_sequence_runner,
        load_exported,
        save_exported,
    )

    cfg = DEFAULT_CONFIG.replace(use_frames=False, enable_tagging=True)
    T = 20
    data = export_sequence_runner(cfg, T, platforms=("cpu",))
    p = tmp_path / "runner.jaxexport"
    save_exported(str(p), data)
    run2 = deserialize_runner(load_exported(str(p)), cfg, T)

    dets = simulated_detection_stream(T)
    inputs = dict(example_sequence_inputs(cfg, T))
    for k in ("bbox", "class_id", "confidence", "valid"):
        inputs[k] = jnp.asarray(dets[k])

    f1, o1 = make_sequence_runner(cfg, donate=False)(initial_state(cfg), inputs)
    f2, o2 = run2(initial_state(cfg), inputs)
    l1 = jax.tree_util.tree_leaves((f1, o1))
    l2 = jax.tree_util.tree_leaves((f2, o2))
    assert len(l1) == len(l2) and len(l1) > 50
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_aot_export_tpu_lowering_from_cpu_host():
    """A TPU-targeted artifact can be produced on a CPU-only host (lowering
    does not need the device); the serialized bytes are non-trivial."""
    from multimodal_autonomous_driving_perception_and_planning_tpu import (
        DEFAULT_CONFIG,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.utils.export import (
        export_sequence_runner,
    )

    cfg = DEFAULT_CONFIG.replace(use_frames=False, enable_tagging=False)
    data = export_sequence_runner(cfg, 4, platforms=("tpu", "cpu"))
    assert isinstance(data, (bytes, bytearray)) and len(data) > 10_000

    # The cross-host workflow composes with serving scale-out: a TPU-only
    # artifact with the micro-batch lane axis sharded over 4 devices can be
    # produced on this CPU host too (the mesh supplies logical device ids;
    # the platform comes from `platforms`), and it pins the device count.
    from jax import export as jexport

    sharded = export_sequence_runner(cfg, 4, platforms=("tpu",), batch=4, dp=4)
    assert jexport.deserialize(sharded).nr_devices == 4


def test_aot_export_tpu_only_contains_fused_kernels(monkeypatch):
    """A TPU-only artifact exported from a CPU host must carry the Mosaic
    kernels (lowering-time dispatch, ops.dispatch) — the serving tier's
    performance must not depend on which host produced the artifact."""
    monkeypatch.delenv("MADPP_DISPATCH_BACKEND", raising=False)
    from jax import export as jexport

    from multimodal_autonomous_driving_perception_and_planning_tpu import (
        DEFAULT_CONFIG,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.utils.export import (
        export_sequence_runner,
    )

    cfg = DEFAULT_CONFIG.replace(use_frames=False, enable_tagging=False)
    data = export_sequence_runner(cfg, 4, platforms=("tpu",))
    module = jexport.deserialize(data).mlir_module()
    assert "tpu_custom_call" in module or "mosaic" in module.lower(), (
        "TPU-only artifact is missing the Pallas kernels"
    )
