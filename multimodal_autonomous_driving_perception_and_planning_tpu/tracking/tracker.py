"""IoU-greedy multi-object tracker over a fixed slot table.

TPU-native rebuild of src/tracking/multi_object_tracker.py:166-241.  The
reference mutates a Dict[int, Track]; here the whole lifecycle —
associate -> matched update -> miss increment -> birth -> death -> confirm —
is one pure function over a `TrackTable` pytree, suitable as a `lax.scan`
carry and `vmap`-able across cameras/sequences.

Parity notes (each maps to a reference behavior):
  * Greedy matching consumes the max-IoU pair repeatedly with numpy's
    row-major first-max tie-break (:137-159) — see ops.association.
  * Matched tracks keep their original class_id; only bbox/confidence are
    refreshed (:192-196).
  * Velocity is the frame-diff of box centers computed *before* the bbox
    overwrite (:186-189).
  * Births consume unmatched detections in detection-index order and take
    sequential ids (:214-225).  Slots are allocated lowest-free-first; the
    reference iteration order (insertion order == ascending id) is recovered
    via `id_rank` wherever ordering matters.
  * Death strictly after the miss increment: ``misses > max_age`` (:228-233).
  * Confirmed = ``hits >= min_hits`` (:236-241), including currently-missed
    tracks.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import TrackerConfig
from ..ops.association import greedy_associate
from ..ops.geometry import pairwise_iou
from ..types import Detections, TrackTable

_I32_MAX = jnp.iinfo(jnp.int32).max


def _rank_by_count(key: jnp.ndarray) -> jnp.ndarray:
    """Stable ascending rank of each element: equivalent to
    ``argsort(argsort(key))`` with stable ties, computed as one (N, N)
    comparison pass.  TPU lowers `argsort` to a multi-stage bitonic
    network; at table sizes (<=128) counting dominated pairs in a single
    fused VPU pass is several times cheaper."""
    n = key.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)  # j (row) index
    lt = key[:, None] < key[None, :]  # [j, i]: key_j < key_i
    tie_before = (key[:, None] == key[None, :]) & (
        idx < jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    )
    return jnp.sum(lt | tie_before, axis=0).astype(jnp.int32)


def _invert_permutation(rank: jnp.ndarray) -> jnp.ndarray:
    """order[r] = i such that rank[i] == r, without scatter/argsort: an
    (N, N) equality mask contracted against the index vector."""
    n = rank.shape[0]
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)  # output rank r
    eq = rank[None, :] == r_iota  # [r, i]
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return jnp.sum(jnp.where(eq, idx, 0), axis=1).astype(jnp.int32)


def id_rank(table: TrackTable) -> jnp.ndarray:
    """Rank of each slot in the reference's iteration order.

    The reference iterates ``self.tracks`` in dict-insertion order, which is
    ascending track id because ids are assigned monotonically.  Dead slots
    get the largest ranks.
    """
    key = jnp.where(table.alive, table.track_id, _I32_MAX)
    return _rank_by_count(key)


def confirmed_mask(table: TrackTable, min_hits: int) -> jnp.ndarray:
    return table.alive & (table.hits >= min_hits)


def confirmed_order(table: TrackTable, min_hits: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Slots of confirmed tracks sorted ascending by id, plus the count."""
    mask = confirmed_mask(table, min_hits)
    key = jnp.where(mask, table.track_id, _I32_MAX)
    order = _invert_permutation(_rank_by_count(key))
    return order, jnp.sum(mask).astype(jnp.int32)


def tracker_update_with_order(
    table: TrackTable, dets: Detections, cfg: TrackerConfig,
    min_hits: int = None, backend: str | None = None,
):
    """`tracker_update` + `confirmed_order` in one call.

    On TPU the whole thing — lifecycle AND the confirmed-order ranking —
    is the single fused Pallas kernel (`ops.tracker_pallas`), selected at
    lowering time (`ops.dispatch`) so AOT exports lowered for TPU from any
    host contain it; elsewhere it is the XLA path below followed by
    `confirmed_order`.  Returns (new_table, match, order, n_confirmed).
    """
    if min_hits is None:
        min_hits = cfg.min_hits
    from ..ops.dispatch import kernel_or_xla
    from ..ops.tracker_pallas import tracker_update_pallas

    def _xla(table, dets):
        new_table, match = _tracker_update_xla(table, dets, cfg, "cpu")
        order, n_confirmed = confirmed_order(new_table, min_hits)
        return new_table, match, order, n_confirmed

    return kernel_or_xla(
        lambda t, d: tracker_update_pallas(t, d, cfg, min_hits),
        _xla,
        table,
        dets,
        backend=backend,
    )


def tracker_update(
    table: TrackTable, dets: Detections, cfg: TrackerConfig,
    backend: str | None = None,
) -> Tuple[TrackTable, jnp.ndarray]:
    """One tracker step.

    Returns the new table and the per-slot matched-detection index
    (-1 where unmatched), which downstream stages can use for diagnostics.

    On TPU the whole step dispatches (at lowering time, `ops.dispatch`)
    to one fused Pallas kernel (`ops.tracker_pallas`) — IoU build,
    association fixpoint, matched updates, trajectory ring, births,
    deaths in a single Mosaic program; bit-identical to this XLA
    formulation (fuzzed in tests/test_tracker_pallas.py).  The XLA path
    (`_tracker_update_xla`) remains the CPU/test path and the
    equivalence oracle.
    """
    from ..ops.dispatch import kernel_or_xla
    from ..ops.tracker_pallas import tracker_update_pallas

    def _kernel(table, dets):
        new_table, match, _, _ = tracker_update_pallas(table, dets, cfg)
        return new_table, match

    return kernel_or_xla(
        _kernel,
        lambda t, d: _tracker_update_xla(t, d, cfg, "cpu"),
        table,
        dets,
        backend=backend,
    )


def _tracker_update_xla(
    table: TrackTable, dets: Detections, cfg: TrackerConfig, backend: str
) -> Tuple[TrackTable, jnp.ndarray]:
    """The XLA tracker step (CPU path and equivalence oracle).

    ``backend`` is forwarded to `greedy_associate` so a pinned-XLA caller
    (oracle comparisons, kernel-vs-XLA benchmarks) really measures the
    pure XLA formulation, association included.
    """
    t_cap = table.track_id.shape[0]
    d_cap = dets.bbox.shape[0]
    traj_cap = table.trajectory.shape[1] // 2  # flat interleaved (T, 2*L)

    # --- associate -------------------------------------------------------
    iou = pairwise_iou(table.bbox, dets.bbox)
    valid_pair = table.alive[:, None] & dets.valid[None, :]
    iou = jnp.where(valid_pair, iou, -1.0)
    match = greedy_associate(
        iou, id_rank(table), cfg.iou_threshold, backend=backend
    )  # (T,)
    matched = match >= 0
    safe = jnp.where(matched, match, 0)

    # --- matched updates (vectorized) ------------------------------------
    det_center = dets.center  # (D, 2)
    new_center = det_center[safe]  # (T, 2)
    vel = new_center - table.center  # computed before bbox overwrite

    alive_inc = table.alive.astype(jnp.int32)
    bbox = jnp.where(matched[:, None], dets.bbox[safe], table.bbox)
    conf = jnp.where(matched, dets.confidence[safe], table.confidence)
    age = table.age + alive_inc  # matched and missed alive tracks both age
    hits = table.hits + matched.astype(jnp.int32)
    misses = jnp.where(matched, 0, table.misses + alive_inc)
    velocity = jnp.where(matched[:, None], vel, table.velocity)
    vel_count = table.vel_count + matched.astype(jnp.int32)

    # Trajectory ring append for matched slots (flat [x0, y0, x1, y1, ...]).
    # Written as dense masked selects over the (T, 2L) buffer: per-row
    # dynamic-column scatter (`.at[rows, 2*widx].set`) is the expensive TPU
    # lowering (same pathology the tagging interaction ring hit, see
    # benchmarks/ANALYSIS.md §3); one fused where-pass is bit-identical.
    widx = table.traj_len % traj_cap  # (T,)
    col = jnp.arange(2 * traj_cap, dtype=jnp.int32)
    at_slot = (col[None, :] // 2) == widx[:, None]  # (T, 2L)
    is_x = (col % 2 == 0)[None, :]
    write = matched[:, None] & at_slot
    trajectory = jnp.where(
        write,
        jnp.where(is_x, new_center[:, 0:1], new_center[:, 1:2]),
        table.trajectory,
    )
    traj_len = table.traj_len + matched.astype(jnp.int32)

    table = TrackTable(
        track_id=table.track_id,
        bbox=bbox,
        class_id=table.class_id,
        confidence=conf,
        age=age,
        hits=hits,
        misses=misses,
        trajectory=trajectory,
        traj_len=traj_len,
        velocity=velocity,
        vel_count=vel_count,
        next_id=table.next_id,
    )

    # --- births: unmatched valid detections, in detection order ----------
    # The reference consumes unmatched detections in index order, each
    # taking the next sequential id (:214-225); slots here are allocated
    # lowest-free-first.  Because the free-slot pool only shrinks during
    # births, the k-th unmatched detection always lands in the k-th lowest
    # free slot with id next_id + k — so the whole pass vectorizes as two
    # argsort-compactions and one masked scatter (no sequential loop).
    det_matched = jnp.any(
        match[:, None] == jnp.arange(d_cap, dtype=match.dtype)[None, :], axis=0
    )
    want = dets.valid & jnp.logical_not(det_matched)  # (D,)
    free = table.track_id == 0  # (T,)
    n_birth = jnp.minimum(jnp.sum(want), jnp.sum(free)).astype(jnp.int32)

    k_cap = min(t_cap, d_cap)
    # Stable compaction (wanted indices ascending, then the rest) without
    # argsort: the rank of a wanted element is its exclusive prefix count
    # of wanted predecessors; unwanted elements rank after all wanted ones.
    # Inverting that rank (equality-mask contraction) yields the order.
    def compact_order(mask):
        n = mask.shape[0]
        m = mask.astype(jnp.int32)
        before = jnp.cumsum(m) - m  # exclusive prefix count of mask
        n_mask = jnp.sum(m)
        idx = jnp.arange(n, dtype=jnp.int32)
        rank = jnp.where(mask, before, n_mask + (idx - before))
        return _invert_permutation(rank)[:k_cap]

    det_order = compact_order(want)
    slot_order = compact_order(free)
    k = jnp.arange(k_cap, dtype=jnp.int32)
    active = k < n_birth
    # Inactive lanes scatter to index t_cap, dropped by mode="drop".
    tgt = jnp.where(active, slot_order.astype(jnp.int32), t_cap)
    src = det_order

    b_center = det_center[src]  # (K, 2)
    b_traj = jnp.zeros((k_cap, 2 * traj_cap), table.trajectory.dtype)
    b_traj = b_traj.at[:, 0:2].set(b_center)
    zeros_k = jnp.zeros((k_cap,), jnp.int32)

    def scatter(dst, values):
        return dst.at[tgt].set(values, mode="drop")

    table = TrackTable(
        track_id=scatter(table.track_id, table.next_id + k),
        bbox=scatter(table.bbox, dets.bbox[src]),
        class_id=scatter(table.class_id, dets.class_id[src]),
        confidence=scatter(table.confidence, dets.confidence[src]),
        age=scatter(table.age, zeros_k),
        hits=scatter(table.hits, zeros_k + 1),
        misses=scatter(table.misses, zeros_k),
        trajectory=scatter(table.trajectory, b_traj),
        traj_len=scatter(table.traj_len, zeros_k + 1),
        velocity=scatter(table.velocity, jnp.zeros((k_cap, 2), table.velocity.dtype)),
        vel_count=scatter(table.vel_count, zeros_k),
        next_id=table.next_id + n_birth,
    )

    # --- deaths ----------------------------------------------------------
    dead = table.alive & (table.misses > cfg.max_age)
    table = TrackTable(
        track_id=jnp.where(dead, 0, table.track_id),
        bbox=table.bbox,
        class_id=table.class_id,
        confidence=table.confidence,
        age=table.age,
        hits=jnp.where(dead, 0, table.hits),
        misses=table.misses,
        trajectory=table.trajectory,
        traj_len=jnp.where(dead, 0, table.traj_len),
        velocity=table.velocity,
        vel_count=jnp.where(dead, 0, table.vel_count),
        next_id=table.next_id,
    )

    return table, match
