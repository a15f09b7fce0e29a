"""Pallas TPU kernel for the COMPLETE tracker step.

`tracking.tracker.tracker_update` (the TPU rebuild of the reference's
``MultiObjectTracker.update``, src/tracking/multi_object_tracker.py:166-241)
is bit-exact but issue-latency-bound on TPU: IoU build, the association
fixpoint, matched-row selects, the trajectory-ring write, birth compaction
and death masking are ~30 separately scheduled small VPU ops — ~40 us/frame
of the dense-traffic step (benchmarks/ANALYSIS.md §3e), the same pathology
the fused ego/tagging kernels removed.  This kernel runs the whole
lifecycle as ONE Mosaic program with every table resident in VMEM, and is
bit-identical to the XLA path (fuzzed in tests/test_tracker_pallas.py; the
300-frame reference-diff keeps track IDs bit-identical).

Kernel-design notes (the repo's Pallas playbook, plus two new tricks):
- No in-kernel transposes: anything needed in both row and column layout
  (old track ids) is passed twice — XLA transposes are free at this size.
  Detection attributes arrive in row layout (1, D) / (4, D); per-slot
  results are column layout (T, 1).
- Gathers (``dets.bbox[match]``, birth compaction's ``dets.bbox[src]``)
  become one-hot masked row-sums: each result row has exactly one
  contributing detection, so ``sum(where(onehot, row, 0), axis=1)`` is
  exact — no gather lowering, no scatter.
- The reference's birth rule ("k-th unmatched detection takes the k-th
  lowest free slot, sequential ids", :214-225) is computed directly as an
  assignment matrix A[s, d] = free_s & want_d & (rank_free_s == rank_want_d
  < n_birth) — replacing the XLA path's two compaction permutations and
  scatter with one (T, D) mask.  rank_free comes from a masked iota
  count; rank_want (a prefix count along the reduced axis) is the one
  place a (1, D) x (D, D) strict-upper-ones matmul is used — 0/1 values,
  counts <= D, exact in any MXU precision.
- The association fixpoint is the same mutual-max iteration as
  ops/association_pallas.py (kept for standalone callers/tests), inlined
  so match feeds the lifecycle without leaving VMEM.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import TrackerConfig
from ..types import Detections, TrackTable

_I32_MAX = jnp.iinfo(jnp.int32).max


def _make_kernel(T: int, D: int, L: int, iou_threshold: float, max_age: int,
                 min_hits: int):
    def kernel(
        id_c, id_r, bbox, cls_c, conf_c, age_c, hits_c, mis_c,
        traj, tlen_c, vel, vcnt_c, nid, dT, dcls_r, dconf_r, dvalid_r,
        hits_r, mis_r, dvalid_c,
        o_id, o_bbox, o_cls, o_conf, o_age, o_hits, o_mis,
        o_traj, o_tlen, o_vel, o_vcnt, o_next, o_match, o_order, o_nconf,
    ):
        alive_c = id_c[:] > 0  # (T, 1)
        bx1, by1 = bbox[:, 0:1], bbox[:, 1:2]
        bx2, by2 = bbox[:, 2:3], bbox[:, 3:4]
        dx1, dy1 = dT[0:1, :], dT[1:2, :]  # (1, D)
        dx2, dy2 = dT[2:3, :], dT[3:4, :]
        dvalid = dvalid_r[:] > 0  # (1, D)

        # --- IoU, op-for-op pairwise_iou (ops/geometry.py:27-43) ----------
        ix1 = jnp.maximum(bx1, dx1)
        iy1 = jnp.maximum(by1, dy1)
        ix2 = jnp.minimum(bx2, dx2)
        iy2 = jnp.minimum(by2, dy2)
        iw = ix2 - ix1
        ih = iy2 - iy1
        inter = jnp.where((iw > 0) & (ih > 0), iw * ih, 0.0)
        area_t = (bx2 - bx1) * (by2 - by1)
        area_d = (dx2 - dx1) * (dy2 - dy1)
        union = area_t + area_d - inter
        iou = jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)
        iou = jnp.where(alive_c & dvalid, iou, -1.0)  # (T, D)

        # --- reference iteration-order rank of each slot (id_rank) --------
        big = jnp.int32(_I32_MAX)
        key_c = jnp.where(alive_c, id_c[:], big)  # (T, 1)
        key_r = jnp.where(id_r[:] > 0, id_r[:], big)  # (1, T)
        jj = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)  # this slot
        ii = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)  # other slot
        rank_c = jnp.sum(
            ((key_r < key_c) | ((key_r == key_c) & (ii < jj))).astype(jnp.int32),
            axis=1,
            keepdims=True,
        )  # (T, 1) stable ascending rank

        # --- greedy association fixpoint (association_pallas.py) ----------
        det_idx = jax.lax.broadcasted_iota(jnp.int32, (T, D), 1)
        key = rank_c * D + det_idx  # (T, D) tie-break key
        thr = jnp.float32(iou_threshold)
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
            row_hit = jnp.any(accept, axis=1, keepdims=True)
            col_hit = jnp.any(accept, axis=0, keepdims=True)
            picked = jnp.min(
                jnp.where(accept, det_idx, big), axis=1, keepdims=True
            )
            match = jnp.where(row_hit, picked, match)
            live = live & ~row_hit & ~col_hit
            return live.astype(jnp.int32), match, jnp.sum(accept.astype(jnp.int32))

        _, match, _ = jax.lax.while_loop(
            cond, body, (eligible0, match0, jnp.int32(1))
        )  # (T, 1)

        # --- matched updates ----------------------------------------------
        matched_c = match >= 0  # (T, 1)
        matched_i = matched_c.astype(jnp.int32)
        M = matched_c & (match == det_idx)  # (T, D) one-hot per matched row

        def sel_f(row):  # (1, D) f32 -> (T, 1), exact single-nonzero sum
            return jnp.sum(jnp.where(M, row, 0.0), axis=1, keepdims=True)

        dcx = (dx1 + dx2) * 0.5
        dcy = (dy1 + dy2) * 0.5
        ncx, ncy = sel_f(dcx), sel_f(dcy)
        ocx = (bx1 + bx2) * 0.5
        ocy = (by1 + by2) * 0.5
        velx = ncx - ocx  # before bbox overwrite (reference :186-189)
        vely = ncy - ocy

        nbx1 = jnp.where(matched_c, sel_f(dx1), bx1)
        nby1 = jnp.where(matched_c, sel_f(dy1), by1)
        nbx2 = jnp.where(matched_c, sel_f(dx2), bx2)
        nby2 = jnp.where(matched_c, sel_f(dy2), by2)
        nconf = jnp.where(matched_c, sel_f(dconf_r[:]), conf_c[:])
        alive_i = alive_c.astype(jnp.int32)
        nage = age_c[:] + alive_i
        nhits = hits_c[:] + matched_i
        nmis = jnp.where(matched_c, 0, mis_c[:] + alive_i)
        nvelx = jnp.where(matched_c, velx, vel[:, 0:1])
        nvely = jnp.where(matched_c, vely, vel[:, 1:2])
        nvcnt = vcnt_c[:] + matched_i

        # Trajectory ring append (dense masked selects; tracker.py:122-137).
        widx = tlen_c[:] % L  # (T, 1)
        col = jax.lax.broadcasted_iota(jnp.int32, (T, 2 * L), 1)
        at_slot = (col // 2) == widx
        is_x = (col % 2) == 0
        write = matched_c & at_slot
        ntraj = jnp.where(write, jnp.where(is_x, ncx, ncy), traj[:])
        ntlen = tlen_c[:] + matched_i

        # --- births (reference :214-225) -----------------------------------
        det_matched_r = (
            jnp.sum(M.astype(jnp.int32), axis=0, keepdims=True) > 0
        )  # (1, D)
        want_r = dvalid & jnp.logical_not(det_matched_r)  # (1, D)
        free_c = id_c[:] == 0  # (T, 1)
        free_r = id_r[:] == 0  # (1, T)
        # rank among free slots: #{s' < s : free_s'} (ii = s', jj = s).
        rank_free_c = jnp.sum(
            (free_r & (ii < jj)).astype(jnp.int32), axis=1, keepdims=True
        )  # (T, 1)
        # rank among wanted detections: prefix count along the reduced axis
        # -> strict-upper-ones matvec (0/1 values, exact).
        dU = (
            jax.lax.broadcasted_iota(jnp.int32, (D, D), 0)
            < jax.lax.broadcasted_iota(jnp.int32, (D, D), 1)
        ).astype(jnp.float32)
        rank_want_r = jnp.dot(
            want_r.astype(jnp.float32), dU, preferred_element_type=jnp.float32
        ).astype(jnp.int32)  # (1, D)
        n_birth = jnp.minimum(
            jnp.sum(want_r.astype(jnp.int32)), jnp.sum(free_c.astype(jnp.int32))
        )
        A = (
            free_c
            & want_r
            & (rank_free_c == rank_want_r)
            & (rank_free_c < n_birth)
        )  # (T, D) assignment matrix

        birth_c = jnp.any(A, axis=1, keepdims=True)  # (T, 1)

        def bsel_f(row):
            return jnp.sum(jnp.where(A, row, 0.0), axis=1, keepdims=True)

        def bsel_i(row):
            return jnp.sum(jnp.where(A, row, 0), axis=1, keepdims=True)

        next_id = nid[0, 0]
        fid = jnp.where(birth_c, next_id + rank_free_c, id_c[:])
        fbx1 = jnp.where(birth_c, bsel_f(dx1), nbx1)
        fby1 = jnp.where(birth_c, bsel_f(dy1), nby1)
        fbx2 = jnp.where(birth_c, bsel_f(dx2), nbx2)
        fby2 = jnp.where(birth_c, bsel_f(dy2), nby2)
        fcls = jnp.where(birth_c, bsel_i(dcls_r[:]), cls_c[:])
        fconf = jnp.where(birth_c, bsel_f(dconf_r[:]), nconf)
        fage = jnp.where(birth_c, 0, nage)
        fhits = jnp.where(birth_c, 1, nhits)
        fmis = jnp.where(birth_c, 0, nmis)
        bcx, bcy = bsel_f(dcx), bsel_f(dcy)
        btraj = jnp.where(col == 0, bcx, jnp.where(col == 1, bcy, 0.0))
        ftraj = jnp.where(birth_c, btraj, ntraj)
        ftlen = jnp.where(birth_c, 1, ntlen)
        fvelx = jnp.where(birth_c, 0.0, nvelx)
        fvely = jnp.where(birth_c, 0.0, nvely)
        fvcnt = jnp.where(birth_c, 0, nvcnt)

        # --- deaths (strictly after the miss increment, :228-233) ----------
        dead = (fid > 0) & (fmis > max_age)
        fid = jnp.where(dead, 0, fid)
        fhits = jnp.where(dead, 0, fhits)
        ftlen = jnp.where(dead, 0, ftlen)
        fvcnt = jnp.where(dead, 0, fvcnt)

        # --- confirmed_order (tracker.py:80-85), fused ----------------------
        # Needs the NEW track ids in BOTH layouts.  The row layout is
        # rebuilt from row-layout primitives (no transposes): surviving
        # ids equal the old id_r, newborn ids are next_id + rank_free, and
        # the boolean layout conversions (matched/birth per slot as a
        # (1, T) row) are 0/1 dot_general contractions — exact on the MXU.
        onesT = jnp.ones((T, 1), jnp.float32)
        matched_r = (
            jax.lax.dot_general(
                jnp.ones((1, D), jnp.float32),
                M.astype(jnp.float32),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            > 0.0
        )  # (1, T): any matched detection per slot
        alive_r = id_r[:] > 0
        nhits_r = hits_r[:] + matched_r.astype(jnp.int32)
        nmis_r = jnp.where(
            matched_r, 0, mis_r[:] + alive_r.astype(jnp.int32)
        )
        # Births in row layout: A2[d, s] = A[s, d] from (D, 1)/(1, T) parts.
        det_matched_c = (
            jax.lax.dot_general(
                M.astype(jnp.float32), onesT,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            > 0.0
        )  # (D, 1)
        want_c = (dvalid_c[:] > 0) & jnp.logical_not(det_matched_c)
        dL = (
            jax.lax.broadcasted_iota(jnp.int32, (D, D), 1)
            < jax.lax.broadcasted_iota(jnp.int32, (D, D), 0)
        ).astype(jnp.float32)  # strict lower: [d, d'] = d' < d
        rank_want_c = jnp.dot(
            dL, want_c.astype(jnp.float32), preferred_element_type=jnp.float32
        ).astype(jnp.int32)  # (D, 1)
        free_r = id_r[:] == 0
        tU = (
            jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
            < jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
        ).astype(jnp.float32)  # [s', s] = s' < s
        rank_free_r = jnp.dot(
            free_r.astype(jnp.float32), tU, preferred_element_type=jnp.float32
        ).astype(jnp.int32)  # (1, T)
        A2 = (
            want_c
            & free_r
            & (rank_want_c == rank_free_r)
            & (rank_want_c < n_birth)
        )  # (D, T)
        birth_r = jnp.any(A2, axis=0, keepdims=True)  # (1, T)
        fid_r = jnp.where(birth_r, next_id + rank_free_r, id_r[:])
        fhits_r = jnp.where(birth_r, 1, nhits_r)
        fmis_r = jnp.where(birth_r, 0, nmis_r)
        dead_r = (fid_r > 0) & (fmis_r > max_age)
        fid_r = jnp.where(dead_r, 0, fid_r)
        fhits_r = jnp.where(dead_r, 0, fhits_r)

        conf_c_mask = (fid > 0) & (fhits >= min_hits)  # (T, 1)
        conf_r_mask = (fid_r > 0) & (fhits_r >= min_hits)  # (1, T)
        okey_c = jnp.where(conf_c_mask, fid, big)  # (T, 1)
        okey_r = jnp.where(conf_r_mask, fid_r, big)  # (1, T)
        # Stable ascending rank per slot, in ROW layout (rank of slot i =
        # count of slots i' with a smaller key, index tie-break; ii = lane
        # index i, jj = sublane index i' here).
        rank_row = jnp.sum(
            ((okey_c < okey_r) | ((okey_c == okey_r) & (jj < ii))).astype(jnp.int32),
            axis=0,
            keepdims=True,
        )  # (1, T)
        # Invert: order[r] = the slot whose rank is r (ranks are a
        # permutation, so the masked sum selects exactly one index; jj is
        # the output rank r, ii the candidate slot).
        order = jnp.sum(
            jnp.where(rank_row == jj, ii, 0), axis=1, keepdims=True
        ).astype(jnp.int32)  # (T, 1)
        n_conf = jnp.sum(conf_c_mask.astype(jnp.int32))

        # Full-array stores only (lane-sliced VMEM stores are not a proven
        # Mosaic pattern in this repo; scalars go to SMEM like the ego
        # kernel's s_out).
        o_id[:] = fid
        o_bbox[:] = jnp.concatenate([fbx1, fby1, fbx2, fby2], axis=1)
        o_cls[:] = fcls
        o_conf[:] = fconf
        o_age[:] = fage
        o_hits[:] = fhits
        o_mis[:] = fmis
        o_traj[:] = ftraj
        o_tlen[:] = ftlen
        o_vel[:] = jnp.concatenate([fvelx, fvely], axis=1)
        o_vcnt[:] = fvcnt
        o_next[0, 0] = next_id + n_birth
        o_match[:] = match
        o_order[:] = order
        o_nconf[0, 0] = n_conf

    return kernel


def tracker_update_pallas(
    table: TrackTable,
    dets: Detections,
    cfg: TrackerConfig,
    min_hits: int = None,
    *,
    interpret: bool = False,
):
    """Drop-in replacement for `tracking.tracker.tracker_update` (same
    contract, bit-identical results), with `confirmed_order` fused in.

    Returns (new_table, match, order, n_confirmed); ``order``/``n_confirmed``
    are exactly `tracker.confirmed_order(new_table, min_hits)`.
    ``min_hits`` defaults to ``cfg.min_hits``.  `interpret=True` runs
    through the Pallas interpreter (CPU tests).
    """
    T = table.track_id.shape[0]
    D = dets.bbox.shape[0]
    L = table.trajectory.shape[1] // 2
    if min_hits is None:
        min_hits = cfg.min_hits

    kernel = _make_kernel(
        T, D, L, float(cfg.iou_threshold), int(cfg.max_age), int(min_hits)
    )

    col_i = lambda x: x.astype(jnp.int32)[:, None]  # noqa: E731
    col_f = lambda x: x.astype(jnp.float32)[:, None]  # noqa: E731

    out_shapes = (
        jax.ShapeDtypeStruct((T, 1), jnp.int32),  # id
        jax.ShapeDtypeStruct((T, 4), jnp.float32),  # bbox
        jax.ShapeDtypeStruct((T, 1), jnp.int32),  # class
        jax.ShapeDtypeStruct((T, 1), jnp.float32),  # confidence
        jax.ShapeDtypeStruct((T, 1), jnp.int32),  # age
        jax.ShapeDtypeStruct((T, 1), jnp.int32),  # hits
        jax.ShapeDtypeStruct((T, 1), jnp.int32),  # misses
        jax.ShapeDtypeStruct((T, 2 * L), jnp.float32),  # trajectory
        jax.ShapeDtypeStruct((T, 1), jnp.int32),  # traj_len
        jax.ShapeDtypeStruct((T, 2), jnp.float32),  # velocity
        jax.ShapeDtypeStruct((T, 1), jnp.int32),  # vel_count
        jax.ShapeDtypeStruct((1, 1), jnp.int32),  # next_id
        jax.ShapeDtypeStruct((T, 1), jnp.int32),  # match
        jax.ShapeDtypeStruct((T, 1), jnp.int32),  # confirmed order
        jax.ShapeDtypeStruct((1, 1), jnp.int32),  # n_confirmed
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[vmem] * 12 + [smem] + [vmem] * 7,
        out_specs=tuple([vmem] * 11 + [smem] + [vmem, vmem, smem]),
        interpret=interpret,
    )(
        col_i(table.track_id),
        table.track_id.astype(jnp.int32)[None, :],
        table.bbox.astype(jnp.float32),
        col_i(table.class_id),
        col_f(table.confidence),
        col_i(table.age),
        col_i(table.hits),
        col_i(table.misses),
        table.trajectory.astype(jnp.float32),
        col_i(table.traj_len),
        table.velocity.astype(jnp.float32),
        col_i(table.vel_count),
        jnp.reshape(table.next_id, (1, 1)).astype(jnp.int32),
        dets.bbox.astype(jnp.float32).T,
        dets.class_id.astype(jnp.int32)[None, :],
        dets.confidence.astype(jnp.float32)[None, :],
        dets.valid.astype(jnp.int32)[None, :],
        table.hits.astype(jnp.int32)[None, :],
        table.misses.astype(jnp.int32)[None, :],
        col_i(dets.valid),
    )
    (
        o_id, o_bbox, o_cls, o_conf, o_age, o_hits, o_mis,
        o_traj, o_tlen, o_vel, o_vcnt, o_next, o_match, o_order, o_nconf,
    ) = outs
    new_table = TrackTable(
        track_id=o_id[:, 0],
        bbox=o_bbox,
        class_id=o_cls[:, 0],
        confidence=o_conf[:, 0],
        age=o_age[:, 0],
        hits=o_hits[:, 0],
        misses=o_mis[:, 0],
        trajectory=o_traj,
        traj_len=o_tlen[:, 0],
        velocity=o_vel,
        vel_count=o_vcnt[:, 0],
        next_id=o_next[0, 0],
    )
    return new_table, o_match[:, 0], o_order[:, 0], o_nconf[0, 0]
