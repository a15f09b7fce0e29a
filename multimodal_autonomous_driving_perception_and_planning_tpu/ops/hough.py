"""Deterministic Hough line transform.

Replaces cv2.HoughLinesP (src/perception/lane_detector.py:92-103 and
src/tagging/scene_classifier.py:156-162).  HoughLinesP is *probabilistic* —
it samples edge pixels through OpenCV's internal RNG, so its output is not
reproducible and cannot anchor a parity contract.  SURVEY.md section 7 directs
pinning it with a deterministic extractor; this module implements the dense
(standard) Hough transform:

  1. Edge pixels are compacted to a fixed-capacity list in row-major scan
     order (hierarchical block compaction — see `compact_mask`).
  2. Votes are accumulated over a (theta, rho) grid.
  3. Peaks = local maxima above the vote threshold (3x3 accumulator NMS).
  4. Each peak line is reconstructed into one segment by projecting its
     supporting edge pixels (|distance to line| <= 1 px) onto the line
     direction and taking the extremes; segments shorter than
     ``min_line_length`` are dropped.

``max_line_gap`` (150 px at the lane call site — wider than any real gap in
the scenes) is intentionally not modeled: one segment per line.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class HoughLines(NamedTuple):
    segments: jnp.ndarray  # (L, 4) float32 x1, y1, x2, y2
    valid: jnp.ndarray  # (L,) bool
    votes: jnp.ndarray  # (L,) int32
    length: jnp.ndarray  # (L,) float32
    overflow: jnp.ndarray  # () bool — peak pool overflowed; selection was
    #                        scan-order truncated, strongest line may be lost
    edges_overflow: jnp.ndarray  # () bool — more edge pixels than
    #                        ``edge_capacity``; voting saw a scan-order
    #                        (top-of-image-first) truncated edge set


def compact_mask(flat: jnp.ndarray, capacity: int):
    """Indices of the first ``capacity`` set bits of a flat bool mask, in
    ascending (row-major) order.

    ``lax.top_k`` over the 307K-pixel mask is a full sort (~430 us/frame on
    TPU) — the dominant Hough cost.  This hierarchical compaction is pure
    cumsum/gather: block the mask into 128-lane rows, exclusive-scan the
    block counts, locate each output's block with a (capacity x n_blocks)
    comparison count, then pick the rank-th set lane from the gathered
    block row via an in-row prefix sum.  Identical selection semantics to
    top_k with tie-by-index (the set bits all compare equal).

    Returns (idx (capacity,) int32, valid (capacity,) bool).
    """
    n = flat.shape[0]
    B = 128
    pad = (-n) % B
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
    blocks = flat.reshape(-1, B).astype(jnp.int32)  # (nb, B)
    counts = jnp.sum(blocks, axis=1)  # (nb,)
    offs = jnp.cumsum(counts) - counts  # exclusive prefix
    total = jnp.sum(counts)

    k = jnp.arange(capacity, dtype=jnp.int32)
    # Block containing the k-th set bit: number of blocks fully before it.
    lower = offs[None, :] <= k[:, None]  # (capacity, nb)
    blk = jnp.sum(lower.astype(jnp.int32), axis=1) - 1
    blk = jnp.maximum(blk, 0)
    # Gather-free block lookup: block b holds the k-th set bit iff
    # offs[b] <= k < offs[b] + counts[b], which is one-hot per k < total
    # (and all-false past the end, where ``valid`` masks the output
    # anyway).  Both dynamic gathers this replaces — the (capacity, B)
    # row gather blocks[blk] AND the scalar gather offs[blk] — measured
    # as one fused ~9 us/frame serial pass at the lane call site
    # regardless of which one remained (ANALYSIS section 7d), so the row
    # lookup is a (capacity, nb) x (nb, B) bf16 matmul (exact for 0/1
    # block rows) and the rank base is an f32 matvec (offs < 2^24, so
    # f32 accumulation is exact).
    inblk = lower & (k[:, None] < (offs + counts)[None, :])
    rows = jnp.einsum(
        "kb,bc->kc",
        inblk.astype(jnp.bfloat16),
        blocks.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    r = k - jnp.einsum(
        "kb,b->k", inblk.astype(jnp.float32), offs.astype(jnp.float32)
    ).astype(jnp.int32)  # rank within block
    # In-row inclusive prefix sum as a matmul with upper-triangular ones:
    # a lane-axis cumsum lowers to a serial in-lane scan (~245 us/frame at
    # this size); one (capacity, B) x (B, B) bf16 MXU pass is exact for
    # 0/1 rows (prefix <= B = 128 < bf16's 256 exact-integer range).
    tri = jnp.asarray(np.triu(np.ones((B, B), np.float32)), jnp.bfloat16)
    prefix = jnp.einsum(
        "kb,bc->kc",
        rows.astype(jnp.bfloat16),
        tri,
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    lane = jnp.argmax((prefix == (r[:, None] + 1)) & (rows > 0), axis=1)
    idx = blk * B + lane.astype(jnp.int32)
    valid = k < total
    return jnp.where(valid, idx, 0), valid


def compact_edges(edges: jnp.ndarray, capacity: int, row_range=None):
    """(H, W) bool -> fixed-size (x, y, valid) edge-pixel list in row-major
    scan order (see `compact_mask`), plus the total edge count.

    ``row_range=(y0, y1)`` (static ints) restricts compaction to rows
    [y0, y1): when the caller knows the mask is zero outside that band
    (e.g. the lane ROI trapezoid lives in the bottom 40% of the frame),
    scanning only those rows cuts the block-count prefix work
    proportionally without changing the selected pixels or their order.
    """
    if row_range is not None:
        y0, y1 = row_range
        edges = edges[y0:y1]
    else:
        y0 = 0
    h, w = edges.shape
    flat = edges.reshape(-1)
    idx, valid = compact_mask(flat, capacity)
    total = jnp.sum(flat.astype(jnp.int32))
    x = (idx % w).astype(jnp.float32)
    y = (idx // w + y0).astype(jnp.float32)
    return x, y, valid, total


def hough_segments(
    edges: jnp.ndarray,
    vote_threshold: int,
    min_line_length: float,
    num_thetas: int = 180,
    max_lines: int = 64,
    edge_capacity: int = 8192,
    row_range=None,
    refine: bool = True,
) -> HoughLines:
    """Dense Hough transform + segment reconstruction.

    Matches cv2.HoughLinesP's grid: rho resolution 1 px, theta resolution
    pi/num_thetas over [0, pi).

    ``edge_capacity`` bounds the voting edge set (static shape); if the
    frame has more edge pixels the excess is dropped in scan order and
    ``edges_overflow`` is set in the result.  Per-frame cost scales
    ~linearly with the capacity (both the compaction and the voting
    matmul), so call sites size it to their mask: the ROI-restricted lane
    pass needs far less than a full-frame pass.  ``row_range`` restricts
    the edge scan to a static row band (see `compact_edges`).

    ``refine=False`` is the feature-only mode for consumers that need
    line counts/lengths rather than accurate endpoints (the scene
    classifier's thresholded features): it skips the TLS refinement and
    the tight-support recount, taking span extremes over the coarse
    support at the grid theta — roughly half the per-peak cost, with
    endpoint error bounded by the grid quantization (~2 px).
    """
    h, w = edges.shape
    diag = int(math.ceil(math.sqrt(h * h + w * w)))
    n_rho = 2 * diag + 1

    x, y, valid, n_edges = compact_edges(edges, edge_capacity, row_range)
    wgt = valid.astype(jnp.float32)

    thetas = jnp.arange(num_thetas, dtype=jnp.float32) * (jnp.pi / num_thetas)
    cos_t = jnp.cos(thetas)  # (T,)
    sin_t = jnp.sin(thetas)

    # rho per (theta, pixel); bin index = round(rho) + diag.
    rho = cos_t[:, None] * x[None, :] + sin_t[:, None] * y[None, :]  # (T, K)
    rho_idx = jnp.round(rho).astype(jnp.int32) + diag

    # Accumulator via outer-product histogram instead of scatter-add.
    # Scatter is the classic TPU-hostile op (~18 ms/frame at this size);
    # splitting the rho bin into (hi, lo) radix digits turns voting into
    # one-hot comparisons plus a batched (HI x K) @ (K x LO) matmul on the
    # MXU:  votes[t, hi*LO+lo] = sum_k w_k [hi_tk==hi][lo_tk==lo].
    # bf16 one-hots are exact (0/1), f32 accumulation keeps integer counts
    # exact up to 2^24 >> K.  Bit-identical to the scatter version,
    # ~9x faster (~2 ms/frame at 180 thetas x 8192 edges x 1601 bins).
    LO = 64
    n_hi = (n_rho + LO - 1) // LO
    hi = rho_idx // LO
    lo = rho_idx % LO
    oh_hi = (hi[..., None] == jnp.arange(n_hi)).astype(jnp.bfloat16)
    oh_hi = oh_hi * wgt[None, :, None].astype(jnp.bfloat16)
    oh_lo = (lo[..., None] == jnp.arange(LO)).astype(jnp.bfloat16)
    acc = jnp.einsum(
        "tkh,tkl->thl", oh_hi, oh_lo, preferred_element_type=jnp.float32
    ).reshape(num_thetas, n_hi * LO)[:, :n_rho]  # (T, R)

    # 5x5 local-max NMS on the accumulator: one peak per physical line,
    # suppressing the +-1-bin vote smear around strong lines (no theta wrap
    # handling; lane lines live far from the 0/pi boundary after the slope
    # filter).  Vote-tie plateaus break toward the first bin in row-major
    # scan order: strictly greater than every EARLIER neighbor, >= every
    # later one — a plain `acc >= neigh_max` keeps every tied bin and one
    # physical line comes out as several duplicate segments (burning
    # max_lines slots and double-counting in the scene classifier's
    # num_long_lines gate).
    # Separable decomposition (bit-identical to the naive 24-neighbor
    # sweep, ~3x fewer passes over the (T, R) accumulator — the NMS was
    # the largest single Hough sub-stage at 31.9 us/frame, ANALYSIS §7a):
    #   peak <=> acc == max(5x5 window)   [acc >= every neighbor]
    #        &   acc >  max(earlier neighbors)   [no earlier tie]
    # where "earlier" = rows i-2, i-1 (all 5 cols) + row i, cols j-2, j-1
    # (row-major scan order).  The 5x5 window max is rowmax5(colmax5) and
    # the earlier-max reuses the same colmax5 rows.  jnp.roll wraps at the
    # theta/rho borders exactly like the neighbor sweep did.
    def shift2(a, di, dj):
        return jnp.roll(jnp.roll(a, di, axis=0), dj, axis=1)

    colmax5 = acc
    for dj in (-2, -1, 1, 2):  # max over cols j-2..j+2, incl. self
        colmax5 = jnp.maximum(colmax5, shift2(acc, 0, -dj))
    win_max = colmax5
    for di in (-2, -1, 1, 2):  # then rows i-2..i+2
        win_max = jnp.maximum(win_max, shift2(colmax5, -di, 0))
    before_max = jnp.maximum(
        jnp.maximum(shift2(colmax5, 1, 0), shift2(colmax5, 2, 0)),
        jnp.maximum(shift2(acc, 0, 1), shift2(acc, 0, 2)),
    )
    is_peak = (acc == win_max) & (acc > before_max) & (acc >= vote_threshold)

    # Strongest max_lines peaks, without a top_k sort over the 288K-bin
    # accumulator: compact the (few) peaks into a small pool in scan order,
    # then top_k only the pool by vote count.  Ties keep pool order =
    # row-major scan order, matching the old full top_k's tie behavior.
    # Only if more than pool_size bins peak simultaneously (not reachable
    # at lane vote thresholds) could a strong line be dropped — the
    # ``overflow`` flag in the result makes that truncation detectable.
    pool_size = max(4 * max_lines, 256)
    total_peaks = jnp.sum(is_peak.astype(jnp.int32))
    pool_idx, pool_valid = compact_mask(is_peak.reshape(-1), pool_size)
    pool_scores = jnp.where(pool_valid, acc.reshape(-1)[pool_idx], 0.0)
    scores, in_pool = jax.lax.top_k(pool_scores, max_lines)
    flat_idx = pool_idx[in_pool]
    line_valid = scores > 0
    t_idx = flat_idx // n_rho
    r_idx = flat_idx % n_rho

    ct = cos_t[t_idx]  # (L,)
    st = sin_t[t_idx]
    line_rho = (r_idx - diag).astype(jnp.float32)

    # Coarse support: the 1-degree theta grid mis-angles long lines by up to
    # ~2 px at the ends, so gather support generously first...
    d0 = jnp.abs(ct[:, None] * x[None, :] + st[:, None] * y[None, :] - line_rho[:, None])
    support0 = (d0 <= 2.0) & valid[None, :]  # (L, K)
    w0 = support0.astype(jnp.float32)
    n0 = jnp.maximum(jnp.sum(w0, axis=1), 1.0)
    mx = jnp.sum(w0 * x[None, :], axis=1) / n0
    my = jnp.sum(w0 * y[None, :], axis=1) / n0

    if refine:
        # ...then refine each line by total least squares over its support
        # (closed-form 2x2 PCA), recovering sub-bin angle/offset.
        dxc = (x[None, :] - mx[:, None]) * w0
        dyc = (y[None, :] - my[:, None]) * w0
        sxx = jnp.sum(dxc * dxc, axis=1)
        sxy = jnp.sum(dxc * dyc, axis=1)
        syy = jnp.sum(dyc * dyc, axis=1)
        phi = 0.5 * jnp.arctan2(2.0 * sxy, sxx - syy)  # direction of max variance
        dirx, diry = jnp.cos(phi), jnp.sin(phi)
        # Refined normal and rho.
        nx, ny = -diry, dirx
        rho_ref = nx * mx + ny * my

        # Tight support against the refined line.
        d1 = jnp.abs(nx[:, None] * x[None, :] + ny[:, None] * y[None, :] - rho_ref[:, None])
        support = (d1 <= 1.5) & valid[None, :]
    else:
        # Feature-only mode: grid-theta direction, coarse support as-is.
        dirx, diry = -st, ct
        support = support0

    # Projection along the line direction.
    t_par = dirx[:, None] * x[None, :] + diry[:, None] * y[None, :]  # (L, K)
    big = jnp.float32(1e9)
    t_min = jnp.min(jnp.where(support, t_par, big), axis=1)
    t_max = jnp.max(jnp.where(support, t_par, -big), axis=1)
    has_support = jnp.any(support, axis=1)
    length = jnp.where(has_support, t_max - t_min, 0.0)

    t_mean = dirx * mx + diry * my
    x1 = mx + (t_min - t_mean) * dirx
    y1 = my + (t_min - t_mean) * diry
    x2 = mx + (t_max - t_mean) * dirx
    y2 = my + (t_max - t_mean) * diry
    segments = jnp.stack([x1, y1, x2, y2], axis=-1)

    keep = line_valid & has_support & (length >= min_line_length)

    # Distinct accumulator peaks can resolve to the SAME physical segment
    # (their coarse supports capture the same pixels, so the extremes
    # coincide) — cv2.HoughLinesP never re-emits a line because it erases
    # support pixels as it extracts.  Drop exact duplicates of an earlier
    # (higher-score) kept segment; (L, L) compare at L = max_lines is tiny.
    same = jnp.all(
        segments[:, None, :] == segments[None, :, :], axis=-1
    )  # (L, L)
    L = segments.shape[0]
    earlier = jnp.arange(L)[None, :] < jnp.arange(L)[:, None]
    dup = jnp.any(same & earlier & keep[None, :], axis=1)
    keep = keep & jnp.logical_not(dup)
    return HoughLines(
        segments=jnp.where(keep[:, None], segments, 0.0),
        valid=keep,
        votes=scores.astype(jnp.int32),
        length=length,
        overflow=total_peaks > pool_size,
        edges_overflow=n_edges > edge_capacity,
    )
