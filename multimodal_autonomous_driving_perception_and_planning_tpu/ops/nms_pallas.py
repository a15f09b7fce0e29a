"""Pallas TPU kernel for the greedy-NMS suppression fixpoint.

Same algorithm and bit-identical keep decisions as the XLA formulation in
`ops.nms.nms` (score-descending greedy suppression — the semantics of the
torchvision/ultralytics NMS the reference runs inside ``self.model(frame)``,
src/perception/detector.py:103-123), but the data-dependent fixpoint runs
inside ONE Mosaic kernel with the (K, K) IoU matrix resident in VMEM.

Why a kernel here: the XLA ``while_loop`` fixpoint is fine numerically, but
compiled against the larger conv towers (yolov8s/m) it trips a pathological
>35-minute XLA compile on this runtime (benchmarks/ANALYSIS.md §2) — the
same class of scan/loop pathology the association kernel already killed
(ANALYSIS §3).  Mosaic compiles the kernel body once, opaque to XLA, so
the detect graph compiles in ordinary time for every variant.

Kernel-design notes (the repo's Pallas playbook):
- The IoU matrix is built in-kernel from column-layout (K, 4) and
  row-layout (4, K) copies of the boxes — static slices give (K, 1) and
  (1, K) operands for the broadcasts, avoiding any in-kernel transpose.
  The arithmetic replicates `ops.geometry.pairwise_iou` op-for-op, so the
  f32 results (and therefore the keep mask) are bitwise identical.
- The per-round suppression test ``any_i(keep_i & S_ij)`` is a (1, K) x
  (K, K) matvec on the MXU: 0/1 values make it exact (sums <= K << 2^24),
  and it consumes/produces the keep vector in one layout, so the fixpoint
  carries no transposes.
- All operand/output channels are >= 2-D so `jax.vmap` (the batched
  detection frontend) auto-batches the call without tripping Mosaic's
  block-shape check (see ops/association_pallas.py for the rule).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_keep_kernel(bc_ref, br_ref, scores_ref, thr_ref, keep_ref):
    K = bc_ref.shape[0]
    x1c, y1c = bc_ref[:, 0:1], bc_ref[:, 1:2]  # (K, 1)
    x2c, y2c = bc_ref[:, 2:3], bc_ref[:, 3:4]
    x1r, y1r = br_ref[0:1, :], br_ref[1:2, :]  # (1, K)
    x2r, y2r = br_ref[2:3, :], br_ref[3:4, :]

    # pairwise_iou, op-for-op (ops/geometry.py:27-43).
    ix1 = jnp.maximum(x1c, x1r)
    iy1 = jnp.maximum(y1c, y1r)
    ix2 = jnp.minimum(x2c, x2r)
    iy2 = jnp.minimum(y2c, y2r)
    iw = ix2 - ix1
    ih = iy2 - iy1
    intersects = (iw > 0) & (ih > 0)
    inter = jnp.where(intersects, iw * ih, 0.0)
    area_c = (x2c - x1c) * (y2c - y1c)
    area_r = (x2r - x1r) * (y2r - y1r)
    union = area_c + area_r - inter
    iou = jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)

    # S_ij = 1 where an earlier (higher-score) kept candidate i suppresses j.
    i_idx = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    S = ((iou > thr_ref[0, 0]) & (i_idx < j_idx)).astype(jnp.float32)

    alive = (scores_ref[:] > 0).astype(jnp.float32)  # (1, K)

    def f(keep):
        suppressed = jnp.dot(keep, S, preferred_element_type=jnp.float32)
        return alive * (suppressed == 0.0).astype(jnp.float32)

    def cond(carry):
        keep, nxt, it = carry
        return jnp.any(keep != nxt) & (it < K)

    def body(carry):
        _, keep, it = carry
        return keep, f(keep), it + 1

    keep0 = alive
    _, keep, _ = jax.lax.while_loop(
        cond, body, (keep0, f(keep0), jnp.int32(0))
    )
    keep_ref[:] = keep.astype(jnp.int32)


def nms_keep_pallas(
    iou_boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Greedy-NMS keep mask over a score-descending candidate set.

    Args:
      iou_boxes: (K, 4) xyxy, already class-offset when class-aware.
      scores: (K,) descending; entries <= 0 are dead (never kept, never
        suppress).
      iou_threshold: suppression threshold (strict ``>``).

    Returns:
      keep: (K,) bool — exactly `ops.nms`'s XLA fixpoint result.
    """
    K = iou_boxes.shape[0]
    bc = iou_boxes.astype(jnp.float32)
    br = bc.T  # XLA-side transpose (free at this size)
    thr = jnp.full((1, 1), iou_threshold, jnp.float32)
    keep = pl.pallas_call(
        _nms_keep_kernel,
        out_shape=jax.ShapeDtypeStruct((1, K), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(bc, br, scores.astype(jnp.float32)[None, :], thr)
    return keep[0] > 0
