"""Fused tracker Pallas kernel == XLA tracker_update, bit-for-bit.

On TPU `tracking.tracker.tracker_update` dispatches to the Mosaic kernel
(ops/tracker_pallas.py); these tests run the kernel through the Pallas
interpreter on CPU and assert exact equality with the XLA path across
multi-step streams — every table field, every step, including tie-heavy
IoU cases (quantized boxes), saturated tables (no free slots), mass
deaths, and vmap (the multicamera runner batches the kernel).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodal_autonomous_driving_perception_and_planning_tpu.config import (
    TrackerConfig,
)
from multimodal_autonomous_driving_perception_and_planning_tpu.ops.tracker_pallas import (
    tracker_update_pallas,
)
from multimodal_autonomous_driving_perception_and_planning_tpu.tracking.tracker import (
    confirmed_order,
    tracker_update,
)
from multimodal_autonomous_driving_perception_and_planning_tpu.types import (
    Detections,
    TrackTable,
)

FIELDS = (
    "track_id", "bbox", "class_id", "confidence", "age", "hits", "misses",
    "trajectory", "traj_len", "velocity", "vel_count", "next_id",
)


def _random_dets(rng, d_cap, p_valid=0.6, quantize=True):
    cx = rng.uniform(0, 600, d_cap)
    cy = rng.uniform(0, 400, d_cap)
    w = rng.uniform(30, 150, d_cap)
    h = rng.uniform(30, 150, d_cap)
    if quantize:  # coordinate ties -> exact IoU ties
        cx, cy, w, h = (np.round(v / 20) * 20 for v in (cx, cy, w, h))
    bbox = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=1)
    return Detections(
        bbox=jnp.asarray(bbox, jnp.float32),
        class_id=jnp.asarray(rng.integers(0, 8, d_cap), jnp.int32),
        confidence=jnp.asarray(rng.uniform(0.5, 1.0, d_cap), jnp.float32),
        valid=jnp.asarray(rng.random(d_cap) < p_valid),
    )


def _assert_tables_equal(a: TrackTable, b: TrackTable, msg=""):
    for f in FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)),
            err_msg=f"{msg} field {f}",
        )


@pytest.mark.parametrize("t_cap,d_cap", [(16, 8), (64, 16), (128, 64)])
def test_fused_tracker_matches_xla_stream(t_cap, d_cap):
    """Multi-step stream: births, matches, misses, deaths all exercised
    (max_age=2 forces deaths quickly; p_valid churn forces misses)."""
    cfg = TrackerConfig(iou_threshold=0.1, max_age=2, min_hits=3,
                        max_tracks=t_cap, trajectory_length=6)
    rng = np.random.default_rng(t_cap + d_cap)
    xla = TrackTable.empty(t_cap, 6)
    pal = TrackTable.empty(t_cap, 6)
    for step in range(12):
        dets = _random_dets(rng, d_cap)
        xla, m_x = tracker_update(xla, dets, cfg, backend="cpu")
        pal, m_p, o_p, n_p = tracker_update_pallas(pal, dets, cfg, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(m_p), np.asarray(m_x), err_msg=f"match step {step}"
        )
        _assert_tables_equal(pal, xla, msg=f"step {step}")
        o_x, n_x = confirmed_order(xla, cfg.min_hits)
        np.testing.assert_array_equal(
            np.asarray(o_p), np.asarray(o_x), err_msg=f"order step {step}"
        )
        assert int(n_p) == int(n_x), f"n_confirmed step {step}"


def test_fused_tracker_tracks_persist():
    """A stationary detection stream must produce a confirmed, aging track
    with a growing trajectory ring in both paths."""
    cfg = TrackerConfig(iou_threshold=0.3, max_age=30, min_hits=3,
                        max_tracks=16, trajectory_length=4)
    bbox = np.zeros((8, 4), np.float32)
    bbox[0] = [100, 100, 200, 200]
    bbox[1] = [300, 50, 380, 120]
    dets = Detections(
        bbox=jnp.asarray(bbox),
        class_id=jnp.zeros(8, jnp.int32),
        confidence=jnp.full((8,), 0.9, jnp.float32),
        valid=jnp.asarray([True, True] + [False] * 6),
    )
    xla = TrackTable.empty(16, 4)
    pal = TrackTable.empty(16, 4)
    for step in range(7):
        xla, _ = tracker_update(xla, dets, cfg, backend="cpu")
        pal, _, _, _ = tracker_update_pallas(pal, dets, cfg, interpret=True)
    _assert_tables_equal(pal, xla)
    assert int(np.asarray(pal.track_id)[0]) == 1
    assert int(np.asarray(pal.hits)[0]) == 7
    # Ring saturated at capacity 4, len counter keeps counting writes.
    assert int(np.asarray(pal.traj_len)[0]) == 7


def test_fused_tracker_saturated_table():
    """More wanted births than free slots: n_birth clamps to the free
    count and next_id advances by the clamped amount."""
    t_cap, d_cap = 8, 16
    cfg = TrackerConfig(iou_threshold=0.3, max_age=30, min_hits=3,
                        max_tracks=t_cap, trajectory_length=4)
    rng = np.random.default_rng(0)
    # 16 disjoint valid detections vs 8 slots.
    bbox = np.stack(
        [np.arange(d_cap) * 300.0, np.zeros(d_cap),
         np.arange(d_cap) * 300.0 + 100, np.full(d_cap, 100.0)], axis=1
    ).astype(np.float32)
    dets = Detections(
        bbox=jnp.asarray(bbox),
        class_id=jnp.asarray(rng.integers(0, 8, d_cap), jnp.int32),
        confidence=jnp.full((d_cap,), 0.8, jnp.float32),
        valid=jnp.ones(d_cap, bool),
    )
    xla, _ = tracker_update(TrackTable.empty(t_cap, 4), dets, cfg, backend="cpu")
    pal, _, _, _ = tracker_update_pallas(TrackTable.empty(t_cap, 4), dets, cfg,
                                         interpret=True)
    _assert_tables_equal(pal, xla)
    assert int(np.asarray(pal.next_id)) == 1 + t_cap


def test_fused_tracker_vmaps():
    """Multicamera: vmap over the camera axis must auto-batch the kernel
    and match per-camera independent runs."""
    cfg = TrackerConfig(iou_threshold=0.1, max_age=5, min_hits=3,
                        max_tracks=16, trajectory_length=4)
    rng = np.random.default_rng(9)
    cams = 3
    det_list = [_random_dets(rng, 8) for _ in range(cams)]
    stack = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *det_list
    )
    tables = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[TrackTable.empty(16, 4) for _ in range(cams)]
    )
    new_tables, matches, orders, nconfs = jax.vmap(
        lambda t, d: tracker_update_pallas(t, d, cfg, interpret=True)
    )(tables, stack)
    for c in range(cams):
        want, m_want = tracker_update(
            TrackTable.empty(16, 4), det_list[c], cfg, backend="cpu"
        )
        o_want, n_want = confirmed_order(want, cfg.min_hits)
        np.testing.assert_array_equal(np.asarray(orders)[c], np.asarray(o_want))
        assert int(np.asarray(nconfs)[c]) == int(n_want)
        np.testing.assert_array_equal(
            np.asarray(matches)[c], np.asarray(m_want), err_msg=f"cam {c}"
        )
        for f in FIELDS:
            np.testing.assert_array_equal(
                np.asarray(getattr(new_tables, f))[c],
                np.asarray(getattr(want, f)),
                err_msg=f"cam {c} field {f}",
            )
