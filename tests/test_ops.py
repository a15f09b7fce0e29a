"""Unit parity tests for the core device ops vs the float64 oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_autonomous_driving_perception_and_planning_tpu.ops import (
    pairwise_iou,
    greedy_associate,
    kalman_predict,
    kalman_update,
    make_constant_accel_model,
)
from oracle import _iou, OracleEstimator


def random_boxes(rng, n, w=640, h=480):
    x1 = rng.uniform(0, w - 50, n)
    y1 = rng.uniform(0, h - 50, n)
    bw = rng.uniform(10, 150, n)
    bh = rng.uniform(10, 120, n)
    return np.stack([x1, y1, np.minimum(x1 + bw, w), np.minimum(y1 + bh, h)], axis=1)


def test_pairwise_iou_matches_reference_math():
    rng = np.random.default_rng(0)
    a = random_boxes(rng, 13)
    b = random_boxes(rng, 9)
    got = np.asarray(pairwise_iou(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)))
    want = np.array([[_iou(a[i], b[j]) for j in range(9)] for i in range(13)])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pairwise_iou_touching_boxes_are_zero():
    a = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.asarray([[10.0, 0.0, 20.0, 10.0]])  # shares an edge
    assert float(pairwise_iou(a, b)[0, 0]) == 0.0


def test_greedy_association_matches_numpy_greedy():
    rng = np.random.default_rng(1)
    for trial in range(20):
        t, d = rng.integers(1, 12), rng.integers(1, 10)
        iou = rng.uniform(0, 1, (t, d))
        # Oracle: repeated argmax greedy, threshold 0.3.
        m = iou.copy()
        want = {}
        while True:
            if m.max() < 0.3:
                break
            i, j = np.unravel_index(m.argmax(), m.shape)
            want[i] = j
            m[i, :] = -1
            m[:, j] = -1
        rank = np.arange(t, dtype=np.int32)  # rows already in id order
        got = np.asarray(
            greedy_associate(jnp.asarray(iou, jnp.float32), jnp.asarray(rank), 0.3)
        )
        for i in range(t):
            assert got[i] == want.get(i, -1), (trial, i, got, want)


def test_greedy_association_tie_heavy_fuzz():
    """Quantized IoUs force many exact ties; rank permutations exercise the
    reference iteration-order tie-break.  Oracle: repeated first-max greedy
    over rank-reordered rows (multi_object_tracker.py:137-159)."""
    rng = np.random.default_rng(7)
    for trial in range(30):
        t, d = int(rng.integers(1, 40)), int(rng.integers(1, 24))
        iou = (rng.integers(0, 5, (t, d)) / 4.0).astype(np.float32)
        rank = rng.permutation(t).astype(np.int32)
        # Oracle in reference order: rows sorted by rank.
        order = np.argsort(rank)
        m = iou[order].copy()
        want = np.full(t, -1, np.int64)
        while m.size and m.max() >= 0.3:
            i, j = np.unravel_index(m.argmax(), m.shape)
            want[order[i]] = j
            m[i, :] = -1
            m[:, j] = -1
        got = np.asarray(
            greedy_associate(jnp.asarray(iou), jnp.asarray(rank), 0.3)
        )
        np.testing.assert_array_equal(got, want, err_msg=str(trial))


def test_greedy_association_tie_break_row_major():
    # Two identical IoUs: numpy argmax picks the first in row-major order.
    iou = np.array([[0.5, 0.5], [0.5, 0.4]], np.float32)
    rank = np.arange(2, dtype=np.int32)
    got = np.asarray(greedy_associate(jnp.asarray(iou), jnp.asarray(rank), 0.3))
    # (0,0) first, then (1,1) has 0.4 >= 0.3.
    assert got.tolist() == [0, 1]


def test_greedy_association_respects_rank_order():
    # Row 1 has the earlier track id (rank 0) -> wins the tie.
    iou = np.array([[0.5, 0.0], [0.5, 0.0]], np.float32)
    rank = np.asarray([1, 0], np.int32)
    got = np.asarray(greedy_associate(jnp.asarray(iou), jnp.asarray(rank), 0.3))
    assert got.tolist() == [-1, 0]


def test_kalman_single_step_matches_oracle():
    oracle = OracleEstimator()
    model = make_constant_accel_model(0.033)
    x = jnp.zeros(6)
    P = jnp.eye(6) * 10.0
    z = np.array([1.0, 2.0, 3.0, 0.5])
    # predict
    ox, oP = oracle.F @ oracle.x, oracle.F @ oracle.P @ oracle.F.T + oracle.Q
    x, P = kalman_predict(model, x, P)
    np.testing.assert_allclose(np.asarray(x), ox, atol=1e-5)
    np.testing.assert_allclose(np.asarray(P), oP, atol=1e-5)
    # update (Joseph form)
    y = z - oracle.H @ ox
    PHT = oP @ oracle.H.T
    S = oracle.H @ PHT + oracle.R
    K = PHT @ np.linalg.inv(S)
    ox2 = ox + K @ y
    I_KH = np.eye(6) - K @ oracle.H
    oP2 = I_KH @ oP @ I_KH.T + K @ oracle.R @ K.T
    x2, P2 = kalman_update(model, x, P, jnp.asarray(z, jnp.float32))
    np.testing.assert_allclose(np.asarray(x2), ox2, atol=1e-4)
    # Covariance entries are O(10); float32 linear solves give ~1e-4 abs.
    np.testing.assert_allclose(np.asarray(P2), oP2, rtol=1e-3, atol=1e-3)


def test_compact_mask_matches_topk_selection():
    """compact_mask picks exactly the first-K set bits in row-major order
    (the selection top_k with tie-by-index used to make), across densities
    incl. overflow and empty masks."""
    from multimodal_autonomous_driving_perception_and_planning_tpu.ops.hough import (
        compact_mask,
    )

    rng = np.random.default_rng(3)
    for trial, (n, density, cap) in enumerate(
        [(1000, 0.01, 64), (307200, 0.002, 256), (500, 0.9, 64), (256, 0.0, 16),
         (8192, 0.5, 128)]
    ):
        mask = rng.random(n) < density
        idx, valid = jax.jit(compact_mask, static_argnums=1)(
            jnp.asarray(mask), cap
        )
        idx, valid = np.asarray(idx), np.asarray(valid)
        want = np.flatnonzero(mask)[:cap]
        assert valid.sum() == len(want), trial
        np.testing.assert_array_equal(idx[: len(want)], want, err_msg=str(trial))
        assert not valid[len(want):].any()


def test_pack_unpack_roundtrip():
    """pack_tree/unpack_tree round-trip an arbitrary mixed pytree exactly,
    including the extra leading scan axis unpack expects."""
    from multimodal_autonomous_driving_perception_and_planning_tpu.pipeline import (
        pack_tree,
        unpack_tree,
    )

    rng = np.random.default_rng(0)
    tree = {
        "a": jnp.asarray(rng.normal(size=()), jnp.float32),
        "b": jnp.asarray(3, jnp.int32),
        "c": jnp.asarray(True),
        "nested": {
            "x": jnp.asarray(rng.normal(size=(64, 4)), jnp.float32),
            "y": jnp.asarray(rng.normal(size=(64,)), jnp.float32),
            "ids": jnp.asarray(rng.integers(0, 9, (64,)), jnp.int32),
            "ring": jnp.asarray(rng.normal(size=(64, 5, 2)), jnp.float32),
        },
        "plan": (jnp.asarray(rng.normal(size=(21, 51)), jnp.float32),
                 jnp.asarray(rng.integers(0, 21, (21,)), jnp.int32)),
    }
    packed, spec = pack_tree(tree)
    assert len(packed) < len(jax.tree_util.tree_leaves(tree))
    # Simulate scan stacking: add a leading time axis of 3.
    stacked = [jnp.stack([p, p, p]) for p in packed]
    out = unpack_tree(stacked, spec)
    for want, got in zip(
        jax.tree_util.tree_leaves(tree), jax.tree_util.tree_leaves(out)
    ):
        assert got.shape == (3,) + want.shape
        np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want))
