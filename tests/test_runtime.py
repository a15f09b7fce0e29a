"""Native C++ frame-ring runtime: build, stream, batch, raw-file mode."""

import numpy as np
import pytest

from multimodal_autonomous_driving_perception_and_planning_tpu.runtime import (
    NativeFrameSource,
    build_runtime,
)


def test_builds_and_streams_synthetic():
    build_runtime()
    with NativeFrameSource(width=320, height=240, slots=4, num_frames=10) as src:
        frames = []
        while True:
            f = src.next_frame()
            if f is None:
                break
            frames.append(f)
        assert len(frames) == 10
        assert frames[0].shape == (240, 320, 3)
        # Sky gradient at top, grass below the horizon.
        assert frames[0][0, 0, 0] > 150  # bright sky blue channel
        assert frames[0][-1, 0, 1] in (60, 110)  # road gray or grass green
        # Frames animate (drifting vehicle).
        assert not np.array_equal(frames[0], frames[9])
        assert src.produced == 10 and src.consumed == 10


def test_batch_drain_overlaps_producer():
    with NativeFrameSource(width=160, height=120, slots=4, num_frames=25) as src:
        b1 = src.next_batch(10)
        b2 = src.next_batch(10)
        b3 = src.next_batch(10)  # only 5 left
        assert b1.shape == (10, 120, 160, 3)
        assert b2.shape[0] == 10
        assert b3.shape[0] == 5
        assert src.consumed == 25


def test_rawfile_mode_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (6, 60, 80, 3), np.uint8)
    raw = tmp_path / "frames.raw"
    raw.write_bytes(frames.tobytes())
    with NativeFrameSource(
        width=80, height=60, slots=3, num_frames=6, raw_path=str(raw)
    ) as src:
        got = src.next_batch(6)
        np.testing.assert_array_equal(got, frames)
        assert src.next_frame(timeout_ms=200) is None


def test_rawfile_truncated_stream_ends_cleanly(tmp_path):
    frames = np.zeros((3, 60, 80, 3), np.uint8)
    raw = tmp_path / "short.raw"
    raw.write_bytes(frames.tobytes())
    with NativeFrameSource(
        width=80, height=60, slots=3, num_frames=10, raw_path=str(raw)
    ) as src:
        got = src.next_batch(10)
        assert got.shape[0] == 3


def test_missing_rawfile_raises(tmp_path):
    """A bad raw path is an error, not a silent empty stream — the caller
    could not otherwise distinguish a typo from a legitimately empty
    source."""
    import pytest

    with pytest.raises(FileNotFoundError):
        NativeFrameSource(
            width=80, height=60, slots=3, num_frames=5,
            raw_path=str(tmp_path / "nope.raw"),
        )


def test_invalid_ring_dimensions_raise():
    import pytest

    for kw in ({"slots": 0}, {"width": 0}, {"height": -1}):
        with pytest.raises(ValueError):
            NativeFrameSource(num_frames=1, **kw)


def test_incremental_ego_motion_bit_identical():
    """IncrementalEgoMotion chunks == one monolithic seed-0 stream, bit for
    bit (the chunked stream driver depends on this for its exactness
    contract)."""
    from multimodal_autonomous_driving_perception_and_planning_tpu.data.synthetic import (
        IncrementalEgoMotion,
        ego_motion_stream,
    )

    want = ego_motion_stream(100, dt=1.0 / 30.0, seed=0)
    inc = IncrementalEgoMotion(dt=1.0 / 30.0, seed=0)
    got = np.concatenate([inc.take(n) for n in (7, 1, 30, 62)])
    np.testing.assert_array_equal(got, want)


def test_run_stream_chunked_matches_monolithic_scan(tmp_path):
    """Overlapped chunked streaming (native ring -> fused scans with state
    chained across chunks) is bit-identical to one monolithic scan."""
    import jax.numpy as jnp

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
    from multimodal_autonomous_driving_perception_and_planning_tpu.runtime.stream import (
        run_stream,
    )

    h, w, total, chunk = 120, 160, 20, 8  # last chunk padded (20 = 8+8+4)
    cfg = DEFAULT_CONFIG.replace(
        use_frames=True, enable_tagging=True, frame_height=h, frame_width=w
    )
    frames = SyntheticRoadGenerator(width=w, height=h).generate_frames(total)
    raw = tmp_path / "clip.raw"
    raw.write_bytes(frames.tobytes())

    with NativeFrameSource(
        width=w, height=h, slots=4, num_frames=total, raw_path=str(raw)
    ) as src:
        outs, stats = run_stream(cfg, src, total, chunk=chunk)
    assert stats["frames"] == total and stats["fps"] > 0

    dets = simulated_detection_stream(
        total, height=h, width=w, capacity=cfg.detector.max_detections
    )
    ego = ego_motion_stream(total, seed=0)
    inputs = {k: jnp.asarray(v) for k, v in dets.items()}
    inputs["ego_measurement"] = jnp.asarray(ego, jnp.float32)
    inputs["frame"] = jnp.asarray(frames)
    run = make_sequence_runner(cfg, donate=False)
    _, ref = run(initial_state(cfg), inputs)

    np.testing.assert_array_equal(
        np.asarray(outs["track_id"]), np.asarray(ref["track_id"])
    )
    np.testing.assert_allclose(
        np.asarray(outs["plan_costs"]), np.asarray(ref["plan_costs"]), rtol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(outs["num_confirmed"]), np.asarray(ref["num_confirmed"])
    )


def test_native_frames_feed_lane_detector():
    """The C++ synthetic frames must exercise the device lane pipeline."""
    import jax
    import jax.numpy as jnp

    from multimodal_autonomous_driving_perception_and_planning_tpu import DEFAULT_CONFIG
    from multimodal_autonomous_driving_perception_and_planning_tpu.perception.lanes import (
        make_lane_step,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.types import LaneState

    with NativeFrameSource(width=640, height=480, slots=4, num_frames=1) as src:
        frame = src.next_frame()
    step = jax.jit(make_lane_step(DEFAULT_CONFIG))
    _, obs, _ = step(LaneState.initial(), jnp.asarray(frame.astype(np.int32)))
    assert bool(obs.left_found) and bool(obs.right_found)


def test_multithreaded_producers_are_order_and_content_exact():
    """N producer threads fill disjoint sequenced slots: the drained stream
    must be byte-identical to the single-thread stream, in frame order."""
    from multimodal_autonomous_driving_perception_and_planning_tpu.runtime.loader import (
        NativeFrameSource,
    )

    n = 48
    with NativeFrameSource(
        width=320, height=240, num_frames=n, slots=8, threads=1
    ) as one:
        want = one.next_batch(n)
    with NativeFrameSource(
        width=320, height=240, num_frames=n, slots=8, threads=6
    ) as many:
        got = many.next_batch(n)
    assert want.shape[0] == n and got.shape[0] == n
    np.testing.assert_array_equal(got, want)


def test_multithreaded_rawfile_pread(tmp_path):
    """Raw-file mode preads frame offsets from per-thread descriptors —
    order-exact under concurrency, truncation still ends the stream."""
    from multimodal_autonomous_driving_perception_and_planning_tpu.runtime.loader import (
        NativeFrameSource,
    )

    w, h, n = 64, 32, 20
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
    raw = tmp_path / "frames.raw"
    raw.write_bytes(frames.tobytes())

    with NativeFrameSource(
        width=w, height=h, num_frames=n, slots=4, raw_path=str(raw), threads=4
    ) as src:
        got = src.next_batch(n)
    np.testing.assert_array_equal(got, frames)

    # Ask for more frames than the file holds: drains what exists, then ends.
    with NativeFrameSource(
        width=w, height=h, num_frames=n + 7, slots=4, raw_path=str(raw), threads=4
    ) as src:
        got = src.next_batch(n + 7, timeout_ms=2000)
    assert got.shape[0] == n
    np.testing.assert_array_equal(got, frames)
