"""Greedy IoU association as a fixed-trip-count device loop.

Replaces the reference's Python ``while True`` greedy matcher
(src/tracking/multi_object_tracker.py:137-159).  The reference repeatedly
takes ``np.unravel_index(iou_matrix.argmax(), ...)`` — i.e. the *first*
maximum in row-major order, where rows are tracks in dict-insertion order
(ascending track id) and columns are detection indices.  To keep track IDs
bit-identical we reproduce that tie-break exactly: among entries achieving
the max IoU, pick the one minimizing ``row_rank * D + det_idx`` where
``row_rank`` is the rank of the slot's track id among alive slots.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = jnp.float32(-1.0)


def greedy_associate(
    iou: jnp.ndarray,
    row_rank: jnp.ndarray,
    iou_threshold: float,
) -> jnp.ndarray:
    """Greedy max-IoU matching.

    Args:
      iou: (T, D) matrix; entries for invalid rows/cols must already be -1
        (the reference marks used rows/cols with -1, :158-159, and all real
        IoUs are >= 0).
      row_rank: (T,) int32 rank of each row in reference iteration order
        (rank of track id among alive slots; dead slots get large ranks).
      iou_threshold: stop when the best remaining IoU drops below this
        (strict ``<`` per multi_object_tracker.py:146-148).

    Returns:
      match: (T,) int32, matched detection index per row, -1 if unmatched.
    """
    T, D = iou.shape
    # Tie-break key, constant through the loop.
    det_idx = jax.lax.broadcasted_iota(jnp.int32, (T, D), 1)
    key = row_rank[:, None] * D + det_idx  # (T, D)
    flat_key = key.reshape(-1)
    flat_row = jax.lax.broadcasted_iota(jnp.int32, (T, D), 0).reshape(-1)
    flat_det = det_idx.reshape(-1)
    big = jnp.int32(T * D + 1)

    def body(_, carry):
        m, match, done = carry
        flat = m.reshape(-1)
        best = jnp.max(flat)
        stop = done | (best < iou_threshold)
        # First max in reference order: min key among exact-max entries.
        eligible = flat == best
        masked_key = jnp.where(eligible, flat_key, big)
        pick = jnp.argmin(masked_key)
        r = flat_row[pick]
        d = flat_det[pick]
        do = jnp.logical_not(stop)
        match = jnp.where(do, match.at[r].set(d), match)
        row_clear = jax.lax.broadcasted_iota(jnp.int32, (T, D), 0) == r
        col_clear = jax.lax.broadcasted_iota(jnp.int32, (T, D), 1) == d
        m = jnp.where(do & (row_clear | col_clear), _NEG, m)
        return m, match, stop

    n_iter = min(T, D)
    match0 = jnp.full((T,), -1, jnp.int32)
    _, match, _ = jax.lax.fori_loop(
        0, n_iter, body, (iou, match0, jnp.asarray(False))
    )
    return match
