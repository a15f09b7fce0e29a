"""Batched box geometry ops.

TPU-native replacement for the reference's per-pair Python IoU
(src/tracking/multi_object_tracker.py:84-105): one broadcasted (T, D)
computation on the VPU instead of a double Python loop.
"""

from __future__ import annotations

import jax.numpy as jnp


def pairwise_iou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """IoU between every pair of xyxy boxes.

    Matches the reference semantics exactly (multi_object_tracker.py:84-105):
    zero-area intersection when edges touch (``<=`` comparison) and 0 when the
    union is non-positive.

    Args:
      boxes_a: (A, 4) float array of (x1, y1, x2, y2).
      boxes_b: (B, 4) float array.

    Returns:
      (A, B) IoU matrix.
    """
    a = boxes_a[:, None, :]  # (A, 1, 4)
    b = boxes_b[None, :, :]  # (1, B, 4)

    x1 = jnp.maximum(a[..., 0], b[..., 0])
    y1 = jnp.maximum(a[..., 1], b[..., 1])
    x2 = jnp.minimum(a[..., 2], b[..., 2])
    y2 = jnp.minimum(a[..., 3], b[..., 3])

    iw = x2 - x1
    ih = y2 - y1
    intersects = (iw > 0) & (ih > 0)
    inter = jnp.where(intersects, iw * ih, 0.0)

    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    union = area_a + area_b - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)
