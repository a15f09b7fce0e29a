"""Pallas TPU kernel for the greedy IoU association fixpoint.

Same algorithm and bit-identical results as `ops.association.greedy_associate`
(the mutual-max acceptance formulation of the reference's Python greedy
matcher, src/tracking/multi_object_tracker.py:137-159) — but the whole
data-dependent fixpoint runs inside ONE Mosaic kernel with the (T, D)
matrix resident in VMEM.

Why a kernel here and nowhere else in this repo: the XLA `while_loop`
formulation pays a host-visible round trip per round (condition sync +
re-dispatch of the ~10-op body), which measures ~35 us/frame at (64, 64)
— the single dominant cost of the fused pipeline step (benchmarks/
ANALYSIS.md §3).  Inside a Pallas kernel the same loop is a branch over
VMEM-resident registers: no per-round launch, no sync.  The "counted
loops inside the 300-frame scan blow XLA compile" pathology (ANALYSIS §3)
does not apply either — Mosaic compiles the kernel body once, opaque to
XLA's scan unroller.

The kernel avoids `argmax` (lowers poorly in Mosaic) by extracting each
row's accepted detection with a min-reduction over the tie-break key:
at most one entry per row is accepted per round, so
``min(where(accept, det_idx, big))`` is exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _associate_kernel(iou_ref, rank_ref, thr_ref, match_ref):
    T, D = iou_ref.shape
    iou = iou_ref[:]  # (T, D) f32
    det_idx = jax.lax.broadcasted_iota(jnp.int32, (T, D), 1)
    key = rank_ref[:] * D + det_idx  # (T, D); rank_ref is (T, 1) int32
    big = jnp.int32(jnp.iinfo(jnp.int32).max)
    thr = thr_ref[0, 0]

    # Mosaic cannot carry i1 vectors through scf.while — the live mask is
    # carried as int32 (1/0) and the progress flag as an int32 scalar.
    eligible0 = ((iou >= thr) & (iou >= 0.0)).astype(jnp.int32)
    match0 = jnp.full((T, 1), -1, jnp.int32)

    def cond(carry):
        _, _, progressed = carry
        return progressed > 0

    def body(carry):
        live_i, match, _ = carry
        live = live_i > 0
        m = jnp.where(live, iou, -1.0)

        row_max = jnp.max(m, axis=1, keepdims=True)
        at_row_max = live & (m == row_max)
        row_best_key = jnp.min(
            jnp.where(at_row_max, key, big), axis=1, keepdims=True
        )
        col_max = jnp.max(m, axis=0, keepdims=True)
        at_col_max = live & (m == col_max)
        col_best_key = jnp.min(
            jnp.where(at_col_max, key, big), axis=0, keepdims=True
        )

        accept = (
            at_row_max
            & at_col_max
            & (key == row_best_key)
            & (key == col_best_key)
        )
        row_hit = jnp.any(accept, axis=1, keepdims=True)  # (T, 1)
        col_hit = jnp.any(accept, axis=0, keepdims=True)  # (1, D)
        # <=1 accept per row, so the min over keyed det indices is exact.
        picked = jnp.min(
            jnp.where(accept, det_idx, big), axis=1, keepdims=True
        )
        match = jnp.where(row_hit, picked, match)
        live = live & ~row_hit & ~col_hit
        n_accepted = jnp.sum(accept.astype(jnp.int32))
        return live.astype(jnp.int32), match, n_accepted

    _, match, _ = jax.lax.while_loop(
        cond, body, (eligible0, match0, jnp.int32(1))
    )
    match_ref[:] = match


def greedy_associate_pallas(
    iou: jnp.ndarray,
    row_rank: jnp.ndarray,
    iou_threshold,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for `association.greedy_associate` (same
    contract; see that docstring).  `interpret=True` runs the kernel in
    the Pallas interpreter (for CPU tests)."""
    T, D = iou.shape
    # (1, 1), not (1,): under `jax.vmap` (the multicamera runner) Pallas
    # auto-batches every operand by prepending a grid axis with block
    # shape (1, *dims); a 1-D operand's batched block (1, n) then fails
    # Mosaic's "last two dims divisible by (8, 128) or equal to the array
    # dims" check against the (B, n) array.  With a 2-D scalar channel the
    # batched block (1, 1, n) keeps trailing dims equal to the array's.
    thr = jnp.full((1, 1), iou_threshold, jnp.float32)
    match = pl.pallas_call(
        _associate_kernel,
        out_shape=jax.ShapeDtypeStruct((T, 1), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(iou.astype(jnp.float32), row_rank.astype(jnp.int32)[:, None], thr)
    return match[:, 0]
