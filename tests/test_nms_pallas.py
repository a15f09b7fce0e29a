"""Pallas NMS kernel == XLA suppression fixpoint, bit-for-bit.

On TPU `ops.nms.nms` dispatches the keep-mask fixpoint to the Mosaic
kernel (nms_pallas.py); these tests run the kernel through the Pallas
interpreter on CPU and assert exact keep-mask equality with the XLA
while-loop path — fuzzed random sets (tie-heavy via quantized
coordinates), suppression chains that force multiple fixpoint rounds,
class-aware offsets, the all-dead case, and vmap (the batched detection
frontend auto-batches the kernel over frames).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodal_autonomous_driving_perception_and_planning_tpu.ops.geometry import (
    pairwise_iou,
)
from multimodal_autonomous_driving_perception_and_planning_tpu.ops.nms import nms
from multimodal_autonomous_driving_perception_and_planning_tpu.ops.nms_pallas import (
    nms_keep_pallas,
)

from test_yolo_nms import oracle_nms


def _xla_keep(iou_boxes, scores, thr):
    """The XLA fixpoint from ops.nms, isolated (scores descending)."""
    k = iou_boxes.shape[0]
    alive = scores > 0
    iou = pairwise_iou(jnp.asarray(iou_boxes), jnp.asarray(iou_boxes))
    rng_k = jnp.arange(k)
    S = np.asarray((iou > thr) & (rng_k[:, None] < rng_k[None, :]))
    keep = alive.copy()
    for _ in range(k + 1):
        nxt = alive & ~np.any(S & keep[:, None], axis=0)
        if (nxt == keep).all():
            break
        keep = nxt
    return keep


def _random_case(rng, k, quantize=True):
    cx = rng.uniform(0, 300, k)
    cy = rng.uniform(0, 200, k)
    w = rng.uniform(20, 120, k)
    h = rng.uniform(20, 120, k)
    if quantize:  # exact coordinate ties -> exact IoU ties
        cx, cy, w, h = (np.round(v / 10) * 10 for v in (cx, cy, w, h))
    boxes = np.stack(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=1
    ).astype(np.float32)
    scores = np.sort(rng.uniform(0, 1, k).astype(np.float32))[::-1].copy()
    scores[rng.random(k) < 0.2] = 0.0  # dead entries
    scores = np.sort(scores)[::-1].copy()  # keep descending after kills
    return boxes, scores


@pytest.mark.parametrize("k", [16, 64, 256])
def test_keep_mask_matches_xla_fuzz(k):
    rng = np.random.default_rng(k)
    for trial in range(8):
        boxes, scores = _random_case(rng, k)
        thr = float(rng.choice([0.1, 0.3, 0.45, 0.7]))
        want = _xla_keep(boxes, scores, thr)
        got = np.asarray(
            nms_keep_pallas(
                jnp.asarray(boxes), jnp.asarray(scores), thr, interpret=True
            )
        )
        np.testing.assert_array_equal(got, want, err_msg=f"k={k} trial {trial}")


def test_suppression_chain_multiple_rounds():
    """Chain a>b>c>... forces one fixpoint round per suppression level."""
    n = 24
    boxes = np.zeros((n, 4), np.float32)
    for i in range(n):
        boxes[i] = [i * 5.0, 0.0, i * 5.0 + 10.0, 10.0]
    scores = np.linspace(0.95, 0.5, n).astype(np.float32)
    want = _xla_keep(boxes, scores, 0.3)
    got = np.asarray(
        nms_keep_pallas(jnp.asarray(boxes), jnp.asarray(scores), 0.3, interpret=True)
    )
    np.testing.assert_array_equal(got, want)
    assert got.sum() == (n + 1) // 2  # alternating keep pattern


def test_all_dead_and_all_kept():
    k = 32
    boxes = np.stack(
        [np.arange(k) * 100.0, np.zeros(k), np.arange(k) * 100.0 + 10, np.full(k, 10.0)],
        axis=1,
    ).astype(np.float32)  # disjoint -> all kept
    scores = np.linspace(0.9, 0.3, k).astype(np.float32)
    got = np.asarray(
        nms_keep_pallas(jnp.asarray(boxes), jnp.asarray(scores), 0.45, interpret=True)
    )
    assert got.all()
    got0 = np.asarray(
        nms_keep_pallas(
            jnp.asarray(boxes), jnp.zeros(k, np.float32), 0.45, interpret=True
        )
    )
    assert not got0.any()


def test_full_nms_entry_point_tpu_path_interpreted():
    """ops.nms with the kernel (interpret) == ops.nms CPU path == oracle,
    including the class-aware offset and compaction tail."""
    from multimodal_autonomous_driving_perception_and_planning_tpu.ops import nms_pallas

    rng = np.random.default_rng(3)
    n = 200
    cx = rng.uniform(0, 600, n)
    cy = rng.uniform(0, 400, n)
    w = rng.uniform(20, 120, n)
    h = rng.uniform(20, 120, n)
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=1)
    scores = rng.uniform(0, 1, n)
    classes = rng.integers(0, 4, n)

    cpu = nms(
        jnp.asarray(boxes, jnp.float32),
        jnp.asarray(scores, jnp.float32),
        jnp.asarray(classes, jnp.int32),
        max_det=n,
        pre_topk=n,
        backend="cpu",
    )

    # Route the "tpu" branch through the interpreter for this CPU test.
    orig = nms_pallas.nms_keep_pallas

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    nms_pallas.nms_keep_pallas = interp
    try:
        tpu = nms(
            jnp.asarray(boxes, jnp.float32),
            jnp.asarray(scores, jnp.float32),
            jnp.asarray(classes, jnp.int32),
            max_det=n,
            pre_topk=n,
            backend="tpu",
        )
    finally:
        nms_pallas.nms_keep_pallas = orig

    np.testing.assert_array_equal(np.asarray(tpu.valid), np.asarray(cpu.valid))
    np.testing.assert_array_equal(np.asarray(tpu.boxes), np.asarray(cpu.boxes))
    np.testing.assert_array_equal(np.asarray(tpu.classes), np.asarray(cpu.classes))

    want = oracle_nms(boxes, scores, classes)
    got_boxes = np.asarray(tpu.boxes)[np.asarray(tpu.valid)]
    np.testing.assert_allclose(got_boxes, boxes[want], atol=1e-3)


def test_keep_kernel_vmaps():
    """The batched detection frontend vmaps detect_fn over frames; the
    kernel must auto-batch (all channels 2-D, see nms_pallas docstring)."""
    rng = np.random.default_rng(5)
    B, k = 3, 64
    cases = [_random_case(rng, k) for _ in range(B)]
    boxes = jnp.asarray(np.stack([c[0] for c in cases]))
    scores = jnp.asarray(np.stack([c[1] for c in cases]))
    got = np.asarray(
        jax.vmap(lambda b, s: nms_keep_pallas(b, s, 0.45, interpret=True))(
            boxes, scores
        )
    )
    for i, (b, s) in enumerate(cases):
        np.testing.assert_array_equal(got[i], _xla_keep(b, s, 0.45), err_msg=str(i))
