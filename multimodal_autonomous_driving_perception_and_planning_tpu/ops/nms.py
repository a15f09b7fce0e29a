"""Fixed-capacity non-maximum suppression for TPU.

The reference delegates NMS to ultralytics' torch implementation inside
``self.model(frame)`` (src/perception/detector.py:103-123).  This is the
TPU-native equivalent: static shapes throughout, one (K, K) IoU matrix on
the VPU, and the greedy pass expressed as a fixpoint iteration over the
suppression operator (see `nms`) — the exact semantics of
torchvision/ultralytics NMS (score-descending greedy with IoU suppression,
class-aware via the coordinate-offset trick) in ~chain-depth rounds.

Pipeline: score filter -> top-K prefilter -> greedy suppress -> top
``max_det`` survivors, all fixed capacity.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .geometry import pairwise_iou


class NMSResult(NamedTuple):
    boxes: jnp.ndarray  # (max_det, 4) xyxy
    scores: jnp.ndarray  # (max_det,)
    classes: jnp.ndarray  # (max_det,) int32
    valid: jnp.ndarray  # (max_det,) bool


def nms_keep_xla(
    iou_boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float
) -> jnp.ndarray:
    """Greedy keep mask as an XLA suppression fixpoint.

    Candidates must already be score-descending with suppressed/filtered
    entries zeroed (``alive = scores > 0``).  This is the CPU path inside
    :func:`nms` and the on-device oracle for the Mosaic kernel
    (`nms_pallas.nms_keep_pallas`) — tools/tpu_checks.py compares the two
    keep masks bit-for-bit on the real TPU lowering.
    """
    k = scores.shape[0]
    alive = scores > 0
    iou = pairwise_iou(iou_boxes, iou_boxes)  # (k, k)
    rng_k = jnp.arange(k)
    S = (iou > iou_threshold) & (rng_k[:, None] < rng_k[None, :])  # (k, k)

    def f(keep):
        return alive & jnp.logical_not(jnp.any(S & keep[:, None], axis=0))

    def cond(carry):
        keep, nxt, it = carry
        return jnp.any(keep != nxt) & (it < k)

    def body(carry):
        _, keep, it = carry
        return keep, f(keep), it + 1

    keep0 = alive
    _, keep, _ = jax.lax.while_loop(
        cond, body, (keep0, f(keep0), jnp.asarray(0, jnp.int32))
    )
    return keep


def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    iou_threshold: float = 0.45,
    score_threshold: float = 0.25,
    max_det: int = 300,
    pre_topk: int = 1024,
    class_aware: bool = True,
    max_wh: float = 7680.0,
    backend: str = None,
) -> NMSResult:
    """Greedy NMS over an (N, 4) candidate set.

    On TPU the suppression fixpoint dispatches (at lowering time,
    `ops.dispatch`) to the Pallas kernel in `nms_pallas` — bit-identical
    keep decisions, but the data-dependent loop is opaque to XLA, which
    kills the >35-minute compile the XLA while_loop triggered against the
    yolov8s/m towers (ANALYSIS.md §2).  The kernel route applies for
    k <= 512: it holds two (k, k) f32 buffers simultaneously VMEM-resident
    (2 MB each at k=512; k=1024 would need >8 MB plus operands and has
    never been validated on hardware), so larger pools keep the XLA
    fixpoint.  ``backend`` overrides the platform choice at trace time for
    oracle comparisons.

    Args:
      boxes: (N, 4) xyxy.
      scores: (N,) confidence.
      classes: (N,) int32 class ids.
      class_aware: offset boxes per class so suppression never crosses
        classes (ultralytics' ``c = x[:, 5:6] * max_wh`` trick).
    """
    scores = jnp.where(scores > score_threshold, scores, 0.0)

    k = min(pre_topk, boxes.shape[0])
    top_scores, idx = jax.lax.top_k(scores, k)
    top_boxes = boxes[idx]
    top_classes = classes[idx]
    alive = top_scores > 0

    if class_aware:
        offset = top_classes.astype(jnp.float32)[:, None] * max_wh
        iou_boxes = top_boxes + offset
    else:
        iou_boxes = top_boxes

    # top_k returns scores descending, so candidate j can only be suppressed
    # by a *kept* candidate i < j with IoU > threshold.  The greedy keep
    # vector is the unique fixpoint of the antitone operator
    #   f(keep)_j = alive_j & not any_i (keep_i & S_ij),
    # with S_ij = (i < j) & (iou_ij > thr).  Iterating f from keep = alive
    # stabilizes decisions in score order (one suppression-chain level per
    # round), reaching the exact sequential-greedy result in ~chain-depth
    # rounds instead of a k-iteration serial loop; each round is one
    # (k x k) masked any-reduction on the VPU.
    def _keep_kernel(iou_boxes, top_scores):
        from .nms_pallas import nms_keep_pallas

        return nms_keep_pallas(iou_boxes, top_scores, iou_threshold)

    def _keep_xla(iou_boxes, top_scores):
        return nms_keep_xla(iou_boxes, top_scores, iou_threshold)

    if k <= 512:
        from .dispatch import kernel_or_xla

        keep = kernel_or_xla(
            _keep_kernel, _keep_xla, iou_boxes, top_scores, backend=backend
        )
    else:
        keep = _keep_xla(iou_boxes, top_scores)

    # Compact the survivors (score order preserved) into max_det slots.
    kept_scores = jnp.where(keep, top_scores, -1.0)
    sel_scores, sel = jax.lax.top_k(kept_scores, min(max_det, k))
    valid = sel_scores > 0
    out_boxes = jnp.where(valid[:, None], top_boxes[sel], 0.0)
    out_classes = jnp.where(valid, top_classes[sel], 0)
    out_scores = jnp.where(valid, sel_scores, 0.0)

    if max_det > k:  # pad up to max_det
        pad = max_det - k
        out_boxes = jnp.concatenate([out_boxes, jnp.zeros((pad, 4))], axis=0)
        out_scores = jnp.concatenate([out_scores, jnp.zeros((pad,))], axis=0)
        out_classes = jnp.concatenate(
            [out_classes, jnp.zeros((pad,), out_classes.dtype)], axis=0
        )
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)], axis=0)

    return NMSResult(
        boxes=out_boxes, scores=out_scores, classes=out_classes, valid=valid
    )
