"""Pallas association kernel == XLA formulation, bit-for-bit.

On TPU `ops.association.greedy_associate` dispatches to the Mosaic
kernel (association_pallas.py); these tests run the same kernel through
the Pallas interpreter on CPU and assert exact equality with the XLA
while-loop path — including tie-heavy inputs that exercise the
reference's row-major first-max tie-break, the pipeline's real shapes,
and vmap (the multicamera local-vmap path batches the kernel).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodal_autonomous_driving_perception_and_planning_tpu.ops.association import (
    greedy_associate,
)
from multimodal_autonomous_driving_perception_and_planning_tpu.ops.association_pallas import (
    greedy_associate_pallas,
)


def _random_case(rng, t, d):
    iou = rng.random((t, d), np.float32)
    q = int(rng.integers(1, 6))
    iou = np.round(iou * q) / q  # quantize -> exact ties
    alive = rng.random(t) < 0.7
    valid = rng.random(d) < 0.8
    iou = np.where(alive[:, None] & valid[None, :], iou, -1.0).astype(np.float32)
    rank = np.argsort(np.argsort(rng.random(t))).astype(np.int32)
    return iou, rank


@pytest.mark.parametrize("shape", [(64, 16), (64, 64), (128, 64), (16, 16)])
def test_pallas_matches_xla_fuzz(shape):
    t, d = shape
    rng = np.random.default_rng(t * 1000 + d)
    for trial in range(10):
        iou, rank = _random_case(rng, t, d)
        thr = float(rng.choice([0.0, 0.3, 0.5]))
        want = np.asarray(
            greedy_associate(
                jnp.asarray(iou), jnp.asarray(rank), thr, backend="cpu"
            )
        )
        got = np.asarray(
            greedy_associate_pallas(
                jnp.asarray(iou), jnp.asarray(rank), thr, interpret=True
            )
        )
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")


def test_pallas_empty_and_full():
    # No eligible pairs at all -> all -1; saturated identical IoUs -> the
    # rank/row-major cascade fills min(T, D) matches.
    t, d = 16, 16
    rank = np.arange(t, dtype=np.int32)
    none = np.full((t, d), -1.0, np.float32)
    got = np.asarray(
        greedy_associate_pallas(jnp.asarray(none), jnp.asarray(rank), 0.3,
                                interpret=True)
    )
    assert (got == -1).all()

    ones = np.ones((t, d), np.float32)
    want = np.asarray(
        greedy_associate(jnp.asarray(ones), jnp.asarray(rank), 0.3, backend="cpu")
    )
    got = np.asarray(
        greedy_associate_pallas(jnp.asarray(ones), jnp.asarray(rank), 0.3,
                                interpret=True)
    )
    np.testing.assert_array_equal(got, want)
    assert (got == np.arange(t)).all()  # diagonal under row-major tie-break


def test_pallas_vmap_matches_per_camera():
    """vmap over the camera axis (parallel/mesh.py local-vmap fallback)."""
    rng = np.random.default_rng(3)
    cams = 4
    ious, ranks = [], []
    for _ in range(cams):
        iou, rank = _random_case(rng, 64, 16)
        ious.append(iou)
        ranks.append(rank)
    ious = jnp.asarray(np.stack(ious))
    ranks = jnp.asarray(np.stack(ranks))

    batched = jax.vmap(
        lambda i, r: greedy_associate_pallas(i, r, 0.3, interpret=True)
    )(ious, ranks)
    for c in range(cams):
        want = np.asarray(
            greedy_associate(ious[c], ranks[c], 0.3, backend="cpu")
        )
        np.testing.assert_array_equal(np.asarray(batched[c]), want)
