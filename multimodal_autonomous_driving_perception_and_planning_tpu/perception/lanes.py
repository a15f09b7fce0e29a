"""Lane detection on device.

TPU-native rebuild of src/perception/lane_detector.py:178-218:

  gray -> 5x5 Gaussian -> median-adaptive Canny -> trapezoid ROI mask
  -> deterministic Hough segments -> slope/midpoint left-right split
  -> quadratic polyfit x(y) -> EMA smoothing against the previous fit.

Also computes the scene-classifier frame features (the reference runs a
*second* Canny+Hough pass with fixed thresholds inside
src/tagging/scene_classifier.py:145-162 plus HSV/brightness/Laplacian
stats, :183-257) so the tagging stage never touches the image itself.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import PipelineConfig
from ..ops.hough import hough_segments
from ..ops.image import (
    bgr_to_gray_u8,
    bgr_to_hsv_green_ratio,
    canny,
    downsample2_u8,
    gaussian_blur5_u8,
    laplacian_variance,
    median_u8,
    trapezoid_roi_mask,
)
from ..types import LaneObservation, LaneState


def _solve3(g: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Batched 3x3 solve by Cramer's rule/adjugate: g (..., 3, 3),
    rhs (..., 3) -> (..., 3).  Fully vectorized, no LAPACK-style loops
    for XLA to schedule.  Singular systems (no usable segments) return
    zeros — matching lstsq's minimum-norm solution for the all-zero
    Gram, so downstream where(found, ...) sees no NaNs."""
    c00 = g[..., 1, 1] * g[..., 2, 2] - g[..., 1, 2] * g[..., 2, 1]
    c01 = g[..., 1, 2] * g[..., 2, 0] - g[..., 1, 0] * g[..., 2, 2]
    c02 = g[..., 1, 0] * g[..., 2, 1] - g[..., 1, 1] * g[..., 2, 0]
    det = g[..., 0, 0] * c00 + g[..., 0, 1] * c01 + g[..., 0, 2] * c02
    c10 = g[..., 0, 2] * g[..., 2, 1] - g[..., 0, 1] * g[..., 2, 2]
    c11 = g[..., 0, 0] * g[..., 2, 2] - g[..., 0, 2] * g[..., 2, 0]
    c12 = g[..., 0, 1] * g[..., 2, 0] - g[..., 0, 0] * g[..., 2, 1]
    c20 = g[..., 0, 1] * g[..., 1, 2] - g[..., 0, 2] * g[..., 1, 1]
    c21 = g[..., 0, 2] * g[..., 1, 0] - g[..., 0, 0] * g[..., 1, 2]
    c22 = g[..., 0, 0] * g[..., 1, 1] - g[..., 0, 1] * g[..., 1, 0]
    adj_rows = [
        jnp.stack([c00, c10, c20], axis=-1),
        jnp.stack([c01, c11, c21], axis=-1),
        jnp.stack([c02, c12, c22], axis=-1),
    ]
    sol = jnp.stack(
        [jnp.sum(row * rhs, axis=-1) for row in adj_rows], axis=-1
    )
    safe = jnp.abs(det) > 1e-20
    sol = sol / jnp.where(safe, det, 1.0)[..., None]
    return jnp.where(safe[..., None], sol, jnp.zeros_like(sol))


def _fit_batched(
    xs: jnp.ndarray, ys: jnp.ndarray, wgt: jnp.ndarray, height: float
) -> jnp.ndarray:
    """Weighted quadratic fits x = a y^2 + b y + c over shared sample
    points: xs/ys (P,), wgt (..., P) -> coeffs (..., 3) in np.polyfit
    order (lane_detector.py:156).

    Normal equations + two steps of iterative refinement instead of
    jnp.linalg.lstsq: the SVD behind lstsq costs ~63 us/frame on TPU v5e
    for the (max_lines*samples, 3) system (ANALYSIS §7a) where the 3x3
    Cramer solves plus skinny matvecs cost ~2 us.

    Conditioning: the basis is CENTERED AND SCALED per fit —
    t = (y - weighted_mean(y)) / weighted_std(y) — so the Gram matrix is
    well-conditioned by construction even when the support spans a narrow
    y-band (a single 50 px Hough segment: a global y/h scaling leaves
    cond(G) ~ 1/det at f32 and the Cramer solve returns garbage where
    lstsq's truncated SVD stayed stable; with per-fit standardization the
    same case solves to <0.1 px of float64).  The t-basis coefficients
    map back to raw-y np.polyfit coefficients exactly.  Zero y-spread
    (impossible for slope-filtered segments) degenerates to the singular
    guard's zero solution, matching lstsq's no-data behavior.
    """
    del height  # basis is standardized per fit; kept for API compatibility
    with jax.default_matmul_precision("float32"):
        n = jnp.maximum(jnp.sum(wgt, axis=-1), 1.0)  # (...,)
        m = jnp.sum(wgt * ys, axis=-1) / n  # weighted mean of y
        var = jnp.sum(wgt * (ys - m[..., None]) ** 2, axis=-1) / n
        s = jnp.sqrt(jnp.maximum(var, 1e-12))  # weighted std of y
        t = (ys - m[..., None]) / s[..., None]  # (..., P)
        A = jnp.stack([t * t, t, jnp.ones_like(t)], axis=-1)  # (..., P, 3)
        Aw = A * wgt[..., None]  # (..., P, 3)
        bw = xs * wgt  # (..., P)
        G = jnp.einsum("...pi,...pj->...ij", Aw, Aw)
        r = jnp.einsum("...pi,...p->...i", Aw, bw)
        coeffs = _solve3(G, r)
        for _ in range(2):  # residual through the tall matrix each step
            pred = jnp.einsum("...pi,...i->...p", Aw, coeffs)
            resid = jnp.einsum("...pi,...p->...i", Aw, bw - pred)
            coeffs = coeffs + _solve3(G, resid)
        # x = at*t^2 + bt*t + ct with t=(y-m)/s  ->  a y^2 + b y + c.
        at, bt, ct = coeffs[..., 0], coeffs[..., 1], coeffs[..., 2]
        a = at / (s * s)
        b = bt / s - 2.0 * at * m / (s * s)
        c = at * m * m / (s * s) - bt * m / s + ct
    return jnp.stack([a, b, c], axis=-1)


def fit_lane_polynomial(
    xs: jnp.ndarray, ys: jnp.ndarray, wgt: jnp.ndarray, height: float
) -> jnp.ndarray:
    """Weighted quadratic fit x = a y^2 + b y + c, returned as [a, b, c]
    (np.polyfit coefficient order, lane_detector.py:156).  See
    :func:`_fit_batched` for the method; this is the single-system form.
    """
    return _fit_batched(xs, ys, wgt, height)


def _separate_and_fit(
    lines, valid, width: int, height: int,
    min_abs_slope: float = 0.3, fit_samples: int = 8,
):
    """Slope/midpoint split (lane_detector.py:105-134) + per-side fit.

    The reference fits np.polyfit on the endpoints of *many* HoughLinesP
    sub-segments whose breakpoints scatter along the whole lane
    (lane_detector.py:146-156), so its quadratic is constrained across the
    full y-range.  Our deterministic Hough reconstructs ONE maximal
    segment per line — endpoint-only fitting would see just two tight
    y-clusters and leave the curvature term ill-conditioned (measured
    ~60 px error mid-lane on synthetic roads).  Sampling ``fit_samples``
    points uniformly along each kept segment restores the reference's
    support distribution.
    """
    x1, y1, x2, y2 = lines[:, 0], lines[:, 1], lines[:, 2], lines[:, 3]
    dx = x2 - x1
    vertical = dx == 0
    slope = (y2 - y1) / jnp.where(vertical, 1.0, dx)
    usable = valid & jnp.logical_not(vertical) & (jnp.abs(slope) >= min_abs_slope)
    mid = (x1 + x2) * 0.5
    cx = width / 2.0
    left = usable & (slope < 0) & (mid < cx)
    right = usable & (slope > 0) & (mid > cx)

    # (L, S) sample grid along each segment, endpoints included.
    t = jnp.linspace(0.0, 1.0, fit_samples)[None, :]
    sx = (x1[:, None] + (x2 - x1)[:, None] * t).reshape(-1)
    sy = (y1[:, None] + (y2 - y1)[:, None] * t).reshape(-1)

    # Both sides fit in ONE batched solve (leading axis 2): inside the
    # per-frame scan this halves the count of tiny VPU ops vs two
    # sequential fits — the same issue-latency effect the fused kernels
    # target (ANALYSIS §3b).
    masks = jnp.stack([left, right])  # (2, L)
    n = jnp.sum(masks.astype(jnp.int32), axis=1)  # (2,)
    w = jnp.repeat(
        masks.astype(jnp.float32), fit_samples, axis=1
    )  # (2, L*S), sample order matches sx/sy's reshape
    coeffs = _fit_batched(sx, sy, w, float(height))  # (2, 3)
    found = n > 0
    conf = jnp.minimum(1.0, n.astype(jnp.float32) / 10.0)
    return (
        (coeffs[0], found[0], conf[0]),
        (coeffs[1], found[1], conf[1]),
    )


def make_scene_features(cfg: PipelineConfig):
    """Scene-classifier frame features (scene_classifier.py:145-257): a
    *second* fixed-threshold Canny+Hough pass plus HSV/brightness/Laplacian
    stats.  Shared by the fused lane step and the per-frame compat facade.

    The classifier consumes only thresholded statistics (center edge
    density > 0.15; >5 lines with avg length > 150; the HSV/brightness/
    Laplacian scalars), so by default the Canny+Hough half runs REDUCED:
    at 1/``scene_downsample`` resolution with vote/length thresholds and
    the returned average length scaled by the factor, and with the
    feature-only Hough (no TLS refine/tight-support, ``scene_refine``).
    Tag equivalence vs the full-resolution pass and vs the reference is
    asserted in tests/test_lanes.py and tests/test_reference_diff.py;
    set scene_downsample=1, scene_refine=True for the full pass.
    """
    lc = cfg.lanes
    s = max(1, int(lc.scene_downsample))

    def scene_features(frame: jnp.ndarray, gray: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        if s > 1:
            gray_s = downsample2_u8(gray) if s == 2 else gray[::s, ::s]
        else:
            gray_s = gray
        hs, ws = gray_s.shape
        edges2 = canny(gray_s, jnp.float32(50.0), jnp.float32(150.0))
        center = edges2[hs // 3 : 2 * hs // 3, ws // 3 : 2 * ws // 3]
        center_density = jnp.mean(center.astype(jnp.float32))

        scene_hl = hough_segments(
            edges2,
            vote_threshold=max(1, 100 // s),
            min_line_length=100.0 / s,
            num_thetas=lc.num_thetas,
            max_lines=lc.scene_max_lines,
            edge_capacity=max(256, lc.scene_edge_capacity // (s * s)),
            refine=lc.scene_refine,
        )
        n_scene_lines = jnp.sum(scene_hl.valid.astype(jnp.int32))
        avg_len = jnp.sum(jnp.where(scene_hl.valid, scene_hl.length, 0.0)) / jnp.maximum(
            n_scene_lines, 1
        ).astype(jnp.float32)

        return {
            "center_edge_density": center_density,
            "num_long_lines": n_scene_lines,
            "avg_line_length": avg_len * s,  # full-resolution pixel units
            "green_ratio": bgr_to_hsv_green_ratio(frame),
            "brightness": jnp.mean(gray.astype(jnp.float32)),
            "laplacian_var": laplacian_variance(gray),
        }

    return scene_features


def make_lane_step(cfg: PipelineConfig):
    h, w = cfg.frame_height, cfg.frame_width
    lc = cfg.lanes
    roi = trapezoid_roi_mask(
        h, w, lc.roi_bottom_frac, lc.roi_top_frac, lc.roi_top_y_frac
    )
    sf = lc.smoothing_factor
    scene_features = make_scene_features(cfg)

    def lane_step(
        state: LaneState, frame: jnp.ndarray
    ) -> Tuple[LaneState, LaneObservation, Dict[str, jnp.ndarray]]:
        gray = bgr_to_gray_u8(frame)

        # --- lane pipeline (lane_detector.detect) ------------------------
        blurred = gaussian_blur5_u8(gray)
        med = median_u8(blurred)
        low = jnp.floor(jnp.maximum(0.0, 0.7 * med))  # int() truncation
        high = jnp.floor(jnp.minimum(255.0, 1.3 * med))
        edges = canny(blurred, low, high)
        masked = edges & roi

        # The ROI trapezoid is zero above roi_top_y_frac, so the edge scan
        # only needs the bottom rows of the frame.
        hl = hough_segments(
            masked,
            vote_threshold=lc.hough_threshold,
            min_line_length=lc.hough_min_line_length,
            num_thetas=lc.num_thetas,
            max_lines=lc.max_lines,
            edge_capacity=lc.lane_edge_capacity,
            row_range=(int(h * lc.roi_top_y_frac), h),
        )
        (lf, l_found, l_conf), (rf, r_found, r_conf) = _separate_and_fit(
            hl.segments, hl.valid, w, h, min_abs_slope=lc.min_abs_slope
        )

        # EMA against the previous fit (lane_detector.py:159-161,209-216).
        left_fit = jnp.where(state.left_valid & l_found, sf * state.left_fit + (1 - sf) * lf, lf)
        right_fit = jnp.where(
            state.right_valid & r_found, sf * state.right_fit + (1 - sf) * rf, rf
        )

        new_state = LaneState(
            left_fit=jnp.where(l_found, left_fit, state.left_fit),
            right_fit=jnp.where(r_found, right_fit, state.right_fit),
            left_valid=state.left_valid | l_found,
            right_valid=state.right_valid | r_found,
        )

        # Lane-center offset (lane_detector.py:253-272): evaluate the fits at
        # the frame bottom; the reference int-casts the rasterized points.
        def at_bottom(fit):
            yb = jnp.float32(h)
            xv = fit[0] * yb * yb + fit[1] * yb + fit[2]
            return jnp.trunc(xv)  # .astype(np.int32) truncates

        both = l_found & r_found
        lane_center = (at_bottom(left_fit) + at_bottom(right_fit)) / 2.0
        offset = jnp.where(both, w / 2.0 - lane_center, 0.0)

        obs = LaneObservation(
            left_fit=left_fit,
            right_fit=right_fit,
            left_found=l_found,
            right_found=r_found,
            left_confidence=l_conf,
            right_confidence=r_conf,
            offset_px=offset,
            has_offset=both,
        )

        # --- scene-classifier frame features -----------------------------
        feats = scene_features(frame, gray)
        return new_state, obs, feats

    return lane_step
