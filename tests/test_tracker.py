"""Tracker lifecycle parity: JAX slot table vs dict-based oracle over the
seeded simulated detection stream (track ids must be bit-identical)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_autonomous_driving_perception_and_planning_tpu.config import TrackerConfig
from multimodal_autonomous_driving_perception_and_planning_tpu.data.synthetic import (
    simulated_detections_for_frame,
)
from multimodal_autonomous_driving_perception_and_planning_tpu.tracking.tracker import (
    confirmed_order,
    tracker_update,
)
from multimodal_autonomous_driving_perception_and_planning_tpu.types import Detections, TrackTable
from oracle import OracleTracker


def to_dets(boxes, cls, confs, capacity=16):
    n = len(boxes)
    bbox = np.zeros((capacity, 4), np.float32)
    c = np.zeros((capacity,), np.int32)
    cf = np.zeros((capacity,), np.float32)
    v = np.zeros((capacity,), bool)
    bbox[:n] = boxes
    c[:n] = cls
    cf[:n] = confs
    v[:n] = True
    return Detections(
        bbox=jnp.asarray(bbox),
        class_id=jnp.asarray(c),
        confidence=jnp.asarray(cf),
        valid=jnp.asarray(v),
    )


def confirmed_snapshot(table, order, n):
    """(id, bbox, hits, misses, age) rows in id order."""
    order = np.asarray(order)[: int(n)]
    return [
        (
            int(np.asarray(table.track_id)[s]),
            tuple(np.asarray(table.bbox)[s].tolist()),
            int(np.asarray(table.hits)[s]),
            int(np.asarray(table.misses)[s]),
            int(np.asarray(table.age)[s]),
        )
        for s in order
    ]


@pytest.mark.parametrize("num_frames", [60])
def test_tracker_matches_oracle_on_simulated_stream(num_frames):
    cfg = TrackerConfig()
    table = TrackTable.empty(cfg.max_tracks, cfg.trajectory_length)
    oracle = OracleTracker()
    step = jax.jit(lambda t, d: tracker_update(t, d, cfg))

    for f in range(1, num_frames + 1):
        boxes, cls, confs = simulated_detections_for_frame(f)
        table, _ = step(table, to_dets(boxes, cls, confs))
        want = oracle.update(boxes, cls, confs)

        order, n = confirmed_order(table, cfg.min_hits)
        got = confirmed_snapshot(table, order, n)
        want_rows = [
            (t.track_id, tuple(float(v) for v in t.bbox), t.hits, t.misses, t.age)
            for t in sorted(want, key=lambda t: t.track_id)
        ]
        assert len(got) == len(want_rows), f"frame {f}: count mismatch"
        for g, w in zip(got, want_rows):
            assert g[0] == w[0], f"frame {f}: id mismatch {g} vs {w}"
            np.testing.assert_allclose(g[1], w[1], atol=1e-4)
            assert g[2:] == w[2:], f"frame {f}: lifecycle mismatch {g} vs {w}"


def test_track_death_after_max_age():
    cfg = TrackerConfig(max_age=3, min_hits=1, max_tracks=8)
    table = TrackTable.empty(cfg.max_tracks, cfg.trajectory_length)
    box = np.array([[100, 100, 200, 200]], np.float32)
    d1 = to_dets(box, [0], [0.9], capacity=4)
    empty = to_dets(np.zeros((0, 4)), [], [], capacity=4)

    table, _ = tracker_update(table, d1, cfg)
    assert int(jnp.sum(table.alive)) == 1
    for _ in range(4):  # misses 1..4; dies when misses > 3
        table, _ = tracker_update(table, empty, cfg)
    assert int(jnp.sum(table.alive)) == 0


def test_track_velocity_is_center_diff():
    cfg = TrackerConfig(min_hits=1, max_tracks=8)
    table = TrackTable.empty(cfg.max_tracks, cfg.trajectory_length)
    b0 = np.array([[0, 0, 10, 10]], np.float32)
    b1 = np.array([[2, 2, 12, 12]], np.float32)  # IoU 0.47 > threshold
    table, _ = tracker_update(table, to_dets(b0, [0], [0.9], 4), cfg)
    assert int(table.vel_count[0]) == 0  # no velocity on birth
    table, _ = tracker_update(table, to_dets(b1, [0], [0.9], 4), cfg)
    np.testing.assert_allclose(np.asarray(table.velocity)[0], [2.0, 2.0], atol=1e-5)
    assert int(table.vel_count[0]) == 1


def test_new_track_ids_are_sequential():
    cfg = TrackerConfig(min_hits=1, max_tracks=8)
    table = TrackTable.empty(cfg.max_tracks, cfg.trajectory_length)
    boxes = np.array([[0, 0, 10, 10], [300, 300, 340, 340]], np.float32)
    table, _ = tracker_update(table, to_dets(boxes, [0, 1], [0.9, 0.8], 4), cfg)
    ids = sorted(np.asarray(table.track_id)[np.asarray(table.alive)].tolist())
    assert ids == [1, 2]
    assert int(table.next_id) == 3


# ---------------------------------------------------------------------------
# Opt-in per-agent Kalman bank (no reference analog; parity-neutral)
# ---------------------------------------------------------------------------


def _bank_outs(T, N, tid_stream, center_stream, vel_stream, velcount_stream):
    bbox = np.zeros((T, N, 4), np.float32)
    bbox[..., 0] = center_stream[..., 0] - 10
    bbox[..., 2] = center_stream[..., 0] + 10
    bbox[..., 1] = center_stream[..., 1] - 10
    bbox[..., 3] = center_stream[..., 1] + 10
    return {
        "track_id": jnp.asarray(tid_stream),
        "track_bbox": jnp.asarray(bbox),
        "track_velocity": jnp.asarray(vel_stream),
        "track_vel_count": jnp.asarray(velcount_stream),
    }


def test_kalman_bank_matches_sequential_filter():
    """The vmapped/scanned bank equals an eager per-frame predict/update
    loop on a single continuing track."""
    from multimodal_autonomous_driving_perception_and_planning_tpu.config import (
        DEFAULT_CONFIG,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.ops.kalman import (
        kalman_predict,
        kalman_update,
        make_constant_accel_model,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.tracking.kalman_bank import (
        make_kalman_bank,
    )

    cfg = DEFAULT_CONFIG
    N = cfg.tracker.max_tracks
    T = 12
    rng = np.random.default_rng(0)
    centers = np.zeros((T, N, 2), np.float32)
    path = np.cumsum(rng.normal(3.0, 0.5, (T, 2)), axis=0).astype(np.float32) + 100
    centers[:, 0] = path
    vels = np.zeros((T, N, 2), np.float32)
    vels[1:, 0] = path[1:] - path[:-1]
    vcount = np.zeros((T, N), np.int32)
    vcount[1:, 0] = np.arange(1, T)
    tids = np.zeros((T, N), np.int32)
    tids[:, 0] = 7  # one persistent track in slot 0

    smooth = make_kalman_bank(cfg)
    outs = smooth(_bank_outs(T, N, tids, centers, vels, vcount))

    model = make_constant_accel_model(
        1.0, process_noise=1.0, measurement_noise=4.0, accel_noise_scale=10.0,
    )
    x = jnp.concatenate([jnp.asarray(centers[0, 0]), jnp.zeros(4)])
    P = jnp.eye(6) * 100.0
    want = [np.asarray(x[:2])]
    for t in range(1, T):
        xp, Pp = kalman_predict(model, x, P)
        z = jnp.concatenate([jnp.asarray(centers[t, 0]), jnp.asarray(vels[t, 0])])
        x, P = kalman_update(model, xp, Pp, z)
        want.append(np.asarray(x[:2]))
    np.testing.assert_allclose(
        np.asarray(outs["positions"])[:, 0], np.stack(want), rtol=1e-5, atol=1e-4
    )
    assert bool(np.asarray(outs["valid"])[:, 0].all())
    assert not np.asarray(outs["valid"])[:, 1:].any()


def test_kalman_bank_smooths_jitter_and_resets_on_id_change():
    from multimodal_autonomous_driving_perception_and_planning_tpu.config import (
        DEFAULT_CONFIG,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.tracking.kalman_bank import (
        make_kalman_bank,
    )

    cfg = DEFAULT_CONFIG
    N = cfg.tracker.max_tracks
    T = 40
    rng = np.random.default_rng(1)
    t_axis = np.arange(T, dtype=np.float32)
    true_x = 50.0 + 4.0 * t_axis
    noisy = true_x + rng.normal(0, 3.0, T).astype(np.float32)
    centers = np.zeros((T, N, 2), np.float32)
    centers[:, 0, 0] = noisy
    centers[:, 0, 1] = 200.0
    vels = np.zeros((T, N, 2), np.float32)
    vels[1:, 0, 0] = noisy[1:] - noisy[:-1]
    vcount = np.zeros((T, N), np.int32)
    vcount[1:, 0] = 1
    tids = np.zeros((T, N), np.int32)
    tids[:, 0] = 3
    tids[25:, 0] = 9  # new track reuses slot 0 at t=25 -> reset

    smooth = make_kalman_bank(cfg)
    outs = smooth(_bank_outs(T, N, tids, centers, vels, vcount))
    sm = np.asarray(outs["positions"])[:, 0, 0]

    # Steady state (skip convergence + the reset): smoothed residual
    # against ground truth is tighter than the raw measurements'.
    seg = slice(10, 25)
    raw_err = np.abs(noisy[seg] - true_x[seg]).mean()
    sm_err = np.abs(sm[seg] - true_x[seg]).mean()
    assert sm_err < raw_err, (sm_err, raw_err)

    # Reset at the id change: smoothed position snaps to the measurement.
    np.testing.assert_allclose(sm[25], noisy[25], atol=1e-4)


# ---------------------------------------------------------------------------
# Dense-traffic churn: crowded birth/death semantics at the benchmarked scale
# ---------------------------------------------------------------------------


def test_tracker_dense_churn_matches_oracle():
    """Crowded stream (up to 60 concurrent objects, 128 slots — the dense
    bench config) with objects appearing/disappearing every frame: confirmed
    ids, boxes, and lifecycle counters must stay bit-identical to the
    dict-based oracle (multi_object_tracker.py:166-241 semantics).  The
    kernel-vs-XLA fuzz (test_tracker_pallas) proves the Pallas kernel equals
    this XLA path, so oracle parity here pins BOTH formulations' semantics
    at high occupancy — crowded birth compaction order, mass deaths, and
    IoU ties on the quantized grid — which the persistent-agent bench
    stream never exercises."""
    P = 60  # object pool; <=2 live tracks per object keeps peak slots < 128
    T = 100
    cfg = TrackerConfig(max_tracks=128)
    table = TrackTable.empty(cfg.max_tracks, cfg.trajectory_length)
    oracle = OracleTracker(
        iou_threshold=cfg.iou_threshold,
        max_age=cfg.max_age,
        min_hits=cfg.min_hits,
        trajectory_length=cfg.trajectory_length,
    )
    step = jax.jit(lambda t, d: tracker_update(t, d, cfg))

    rng = np.random.default_rng(17)
    gx, gy = np.meshgrid(np.arange(10), np.arange(6))
    cx = (gx.reshape(-1)[:P] * 60 + 40).astype(np.float64)
    cy = (gy.reshape(-1)[:P] * 72 + 40).astype(np.float64)
    obj_cls = rng.integers(0, 8, P)
    hidden_until = np.zeros(P, np.int64)
    peak = 0

    for f in range(1, T + 1):
        # Random-walk the centers; quantize boxes to multiples of 4 so
        # equal-IoU ties actually occur (tie-break order is the contract).
        cx += rng.normal(0, 2.0, P)
        cy += rng.normal(0, 2.0, P)
        for i in rng.choice(P, size=2, replace=False):
            if rng.random() < 0.4:
                hidden_until[i] = f + rng.integers(1, 40)
        vis = np.flatnonzero(hidden_until <= f)
        qx = np.round(cx[vis] / 4) * 4
        qy = np.round(cy[vis] / 4) * 4
        boxes = np.stack([qx, qy, qx + 60, qy + 44], axis=1).astype(np.float32)
        cls = obj_cls[vis]
        confs = np.round(rng.uniform(0.5, 1.0, len(vis)) * 20) / 20

        table, _ = step(table, to_dets(boxes, cls, confs, capacity=64))
        want = oracle.update([tuple(b) for b in boxes], cls, confs)
        peak = max(peak, len(oracle.tracks))
        assert len(oracle.tracks) <= cfg.max_tracks, "stream outgrew the table"

        order, n = confirmed_order(table, cfg.min_hits)
        got = confirmed_snapshot(table, order, n)
        want_rows = [
            (t.track_id, tuple(float(v) for v in t.bbox), t.hits, t.misses, t.age)
            for t in sorted(want, key=lambda t: t.track_id)
        ]
        assert len(got) == len(want_rows), f"frame {f}: count mismatch"
        for g, w in zip(got, want_rows):
            assert g[0] == w[0], f"frame {f}: id mismatch {g[0]} vs {w[0]}"
            np.testing.assert_allclose(g[1], w[1], atol=1e-4)
            assert g[2:] == w[2:], f"frame {f}: lifecycle mismatch {g} vs {w}"

    # The stream must actually have been dense (not a trivial re-run).
    assert peak >= 55, peak
