"""Device image ops for the perception stack.

TPU-native replacements for the OpenCV calls the reference delegates to
(src/perception/lane_detector.py:66-103, src/tagging/scene_classifier.py:145-257):
grayscale, 5x5 Gaussian blur, median, Canny (Sobel + L1 magnitude + sector
NMS + bounded hysteresis), trapezoid ROI, Laplacian variance, and HSV green
ratio.  Everything is fixed-shape f32/int32 math that XLA fuses; convolutions
lower onto the MXU.

Parity notes:
  * Grayscale uses OpenCV's exact fixed-point BGR coefficients
    ((1868 B + 9617 G + 4899 R + 8192) >> 14).
  * GaussianBlur(5x5, sigma=0) in OpenCV uses the fixed binomial kernel
    [1,4,6,4,1]/16 with REFLECT_101 borders; replicated exactly (including
    the uint8 rounding between passes' fixed-point accumulation — we round
    once at the end, which matches to +-1 LSB).
  * Median over uint8 images is computed exactly via a 256-bin histogram
    (numpy's even-count averaging included), avoiding a device-wide sort.
  * Canny hysteresis is 8-connected BFS in OpenCV; here it is masked
    dilation iterated to fixpoint (bounded by ``hysteresis_iters`` against
    pathological spirals), which reproduces the flood fill for all chains
    shorter than the bound.  Parity is defined at the lane-fit output level
    (SURVEY.md section 7 hard parts).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Color / filtering
# ---------------------------------------------------------------------------


def bgr_to_gray_u8(frame: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) uint8/float BGR -> (H, W) uint8-valued int32 gray.

    Matches cv2.cvtColor(BGR2GRAY) bit-exactly via OpenCV's fixed-point
    weights (B*1868 + G*9617 + R*4899 + 2^13) >> 14.
    """
    f = frame.astype(jnp.int32)
    b, g, r = f[..., 0], f[..., 1], f[..., 2]
    return (b * 1868 + g * 9617 + r * 4899 + (1 << 13)) >> 14


def downsample2_u8(gray: jnp.ndarray) -> jnp.ndarray:
    """(H, W) uint8-valued int32 -> (H//2, W//2) by 2x2 box mean with
    round-half-up integer arithmetic ((a+b+c+d+2) >> 2).

    Used by the reduced scene-feature pass (perception/lanes.py): the
    scene classifier consumes thresholded statistics, not geometry, so a
    half-resolution edge map with proportionally scaled thresholds is
    tag-equivalent (proven on the reference-diff stream) at ~1/4 the
    Canny/compaction/voting cost.
    """
    h, w = gray.shape
    g = gray[: (h // 2) * 2, : (w // 2) * 2].astype(jnp.int32)
    # reduce_window lowers to a native strided window sum; the obvious
    # reshape-to-(H/2, 2, W/2, 2) splits the lane (minor-most) dimension
    # and costs ~167 us/frame vs 5.5 us for this form at 640x480 on
    # TPU v5e (measured, ANALYSIS §7a) — it was the single largest stage
    # of the whole frames path.
    s = jax.lax.reduce_window(g, 0, jax.lax.add, (2, 2), (2, 2), "VALID")
    return (s + 2) >> 2


def _reflect101_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    return jnp.pad(x, ((pad, pad), (pad, pad)), mode="reflect")


def _sep_conv(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Separable 2D convolution with REFLECT_101 border, float32."""
    pad = k.shape[0] // 2
    xp = _reflect101_pad(x.astype(jnp.float32), pad)
    # Rows.
    xr = sum(xp[:, i : i + x.shape[1]] * k[i] for i in range(k.shape[0]))
    # Cols.
    out = sum(xr[i : i + x.shape[0], :] * k[i] for i in range(k.shape[0]))
    return out


def gaussian_blur5_u8(gray: jnp.ndarray) -> jnp.ndarray:
    """cv2.GaussianBlur(gray, (5,5), 0) on a uint8-valued image.

    OpenCV's sigma=0 5-tap kernel is the binomial [1,4,6,4,1]/16.
    Output rounded to the nearest integer (uint8 range preserved upstream).
    """
    k = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
    out = _sep_conv(gray, k)
    return jnp.round(out).astype(jnp.int32)


def median_u8(img: jnp.ndarray) -> jnp.ndarray:
    """Exact median of a uint8-valued image via 256-bin histogram.

    Replicates np.median semantics for even pixel counts (mean of the two
    middle order statistics), as used for the adaptive Canny thresholds
    (lane_detector.py:79).
    """
    flat = jnp.clip(img.reshape(-1), 0, 255)
    n = flat.shape[0]
    # Histogram as a radix one-hot matmul (scatter-add is TPU-hostile):
    # value v = hi*16 + lo, hist[hi, lo] = sum_p [hi_p==hi][lo_p==lo] on the
    # MXU.  bf16 one-hots are exact 0/1; f32 accumulation is exact counts.
    hi = (flat >> 4).astype(jnp.int32)
    lo = (flat & 15).astype(jnp.int32)
    oh_hi = (hi[:, None] == jnp.arange(16)).astype(jnp.bfloat16)
    oh_lo = (lo[:, None] == jnp.arange(16)).astype(jnp.bfloat16)
    hist = jnp.einsum(
        "nh,nl->hl", oh_hi, oh_lo, preferred_element_type=jnp.float32
    ).reshape(256).astype(jnp.int32)
    cdf = jnp.cumsum(hist)
    k_lo = (n - 1) // 2  # 0-based index of lower middle
    k_hi = n // 2
    # Value at order statistic k: first bin whose cdf > k.
    v_lo = jnp.argmax(cdf > k_lo)
    v_hi = jnp.argmax(cdf > k_hi)
    return (v_lo + v_hi).astype(jnp.float32) / 2.0


# ---------------------------------------------------------------------------
# Gradients / Canny
# ---------------------------------------------------------------------------


def sobel3(gray: jnp.ndarray):
    """3x3 Sobel dx, dy with REFLECT_101 border (cv2.Sobel defaults)."""
    g = gray.astype(jnp.float32)
    smooth = jnp.asarray([1.0, 2.0, 1.0])
    diff = jnp.asarray([-1.0, 0.0, 1.0])
    pad = 1
    gp = _reflect101_pad(g, pad)
    h, w = gray.shape

    def conv_rc(row_k, col_k):
        xr = sum(gp[:, i : i + w] * row_k[i] for i in range(3))
        return sum(xr[i : i + h, :] * col_k[i] for i in range(3))

    dx = conv_rc(diff, smooth)  # d/dx: diff along x (cols), smooth along y
    dy = conv_rc(smooth, diff)
    return dx, dy


def canny(
    gray: jnp.ndarray,
    low: jnp.ndarray,
    high: jnp.ndarray,
    hysteresis_iters: int = 64,
) -> jnp.ndarray:
    """Canny edge map (L1 gradient, like cv2.Canny's default).

    Args:
      gray: (H, W) uint8-valued image (already blurred by the caller if the
        reference path blurs — lane_detector blurs, scene_classifier does not).
      low/high: scalar thresholds (may be traced values).
      hysteresis_iters: upper bound on strong-edge propagation rounds
        (the loop exits at fixpoint, usually after a handful of rounds).

    Returns (H, W) bool edge map.
    """
    dx, dy = sobel3(gray)
    mag = jnp.abs(dx) + jnp.abs(dy)

    # Sector non-maximum suppression (OpenCV's tan(22.5) sectoring).
    TG22 = 0.4142135623730951
    adx = jnp.abs(dx)
    ady = jnp.abs(dy)

    def shift(a, di, dj):
        return jnp.roll(jnp.roll(a, di, axis=0), dj, axis=1)

    m_l = shift(mag, 0, 1)  # left neighbor value at (y, x-1)
    m_r = shift(mag, 0, -1)
    m_u = shift(mag, 1, 0)
    m_d = shift(mag, -1, 0)
    m_ul = shift(mag, 1, 1)
    m_ur = shift(mag, 1, -1)
    m_dl = shift(mag, -1, 1)
    m_dr = shift(mag, -1, -1)

    horiz = ady < TG22 * adx  # gradient ~horizontal -> compare left/right
    vert = adx < TG22 * ady  # gradient ~vertical -> compare up/down
    diag_sign = (dx * dy) >= 0  # same sign -> 45 deg, else 135 deg

    keep_h = (mag > m_l) & (mag >= m_r)
    keep_v = (mag > m_u) & (mag >= m_d)
    keep_d45 = (mag > m_ul) & (mag >= m_dr)
    keep_d135 = (mag > m_ur) & (mag >= m_dl)

    keep = jnp.where(
        horiz,
        keep_h,
        jnp.where(vert, keep_v, jnp.where(diag_sign, keep_d45, keep_d135)),
    )

    strong = keep & (mag > high)
    weak = keep & (mag > low)

    # Zero the one-pixel border (roll wraps around; cv2 never marks border).
    h, w = gray.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = (ys > 0) & (ys < h - 1) & (xs > 0) & (xs < w - 1)
    strong = strong & interior
    weak = weak & interior

    def dilate(m):
        out = m
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                if di or dj:
                    out = out | shift(m, di, dj)
        return out

    # Strong-edge propagation through the weak mask until fixpoint
    # (cv2's hysteresis is a full flood fill; iterating to convergence is
    # exact and typically terminates in a handful of rounds, so the
    # while_loop is both more faithful and cheaper than a fixed cap).
    # ``hysteresis_iters`` bounds pathological spirals.
    def cond(carry):
        _, changed, i = carry
        return changed & (i < hysteresis_iters)

    def body(carry):
        s, _, i = carry
        grown = dilate(s) & weak | s
        return grown, jnp.any(grown != s), i + 1

    edges, _, _ = jax.lax.while_loop(
        cond, body, (strong, jnp.asarray(True), jnp.asarray(0, jnp.int32))
    )
    return edges


def laplacian_variance(gray: jnp.ndarray) -> jnp.ndarray:
    """Variance of the 3x3 Laplacian (cv2.Laplacian ksize=1 kernel
    [[0,1,0],[1,-4,1],[0,1,0]]), used for the fog heuristic
    (scene_classifier.py:255-257)."""
    g = gray.astype(jnp.float32)
    gp = _reflect101_pad(g, 1)
    h, w = gray.shape
    lap = (
        gp[0:h, 1 : w + 1]
        + gp[2 : h + 2, 1 : w + 1]
        + gp[1 : h + 1, 0:w]
        + gp[1 : h + 1, 2 : w + 2]
        - 4.0 * g
    )
    return jnp.var(lap)


# ---------------------------------------------------------------------------
# Masks & color stats
# ---------------------------------------------------------------------------


def trapezoid_roi_mask(
    height: int,
    width: int,
    bottom_frac: float = 0.1,
    top_frac: float = 0.4,
    top_y_frac: float = 0.6,
):
    """Front-camera trapezoid (lane_detector.py:55-60), default
    (0.1w, h) - (0.4w, 0.6h) - (0.6w, 0.6h) - (0.9w, h), filled.
    The fractions are LaneConfig's roi_* knobs.

    Rasterized with half-plane tests; matches cv2.fillPoly to within the
    boundary pixel.  Returns a *host* (numpy) bool mask: the mask is closed
    over by jitted lane steps, and numpy constants bake into the HLO at
    trace time, whereas a captured device array degrades every dispatch in
    the process on tunnel-attached TPU runtimes.
    """
    import numpy as np

    v = np.asarray(
        [
            [int(width * bottom_frac), height],
            [int(width * top_frac), int(height * top_y_frac)],
            [int(width * (1.0 - top_frac)), int(height * top_y_frac)],
            [int(width * (1.0 - bottom_frac)), height],
        ],
        np.float32,
    )
    ys, xs = np.mgrid[0:height, 0:width].astype(np.float32)
    mask = np.ones((height, width), bool)
    n = 4
    for i in range(n):
        x1, y1 = v[i]
        x2, y2 = v[(i + 1) % n]
        # This vertex order is counter-clockwise in image coordinates
        # (y down), so interior points have non-negative edge cross products.
        cross = (x2 - x1) * (ys - y1) - (y2 - y1) * (xs - x1)
        mask = mask & (cross >= 0)
    return mask


def bgr_to_hsv_green_ratio(frame: jnp.ndarray) -> jnp.ndarray:
    """Fraction of pixels within cv2.inRange(hsv, (35,40,40), (85,255,255)).

    Implements OpenCV's uint8 HSV convention (H in [0,180)).
    """
    f = frame.astype(jnp.float32)
    b, g, r = f[..., 0], f[..., 1], f[..., 2]
    v = jnp.maximum(jnp.maximum(b, g), r)
    mn = jnp.minimum(jnp.minimum(b, g), r)
    diff = v - mn
    safe = jnp.where(diff > 0, diff, 1.0)
    s = jnp.where(v > 0, diff / jnp.where(v > 0, v, 1.0) * 255.0, 0.0)
    h = jnp.where(
        v == r,
        60.0 * (g - b) / safe,
        jnp.where(v == g, 120.0 + 60.0 * (b - r) / safe, 240.0 + 60.0 * (r - g) / safe),
    )
    h = jnp.where(h < 0, h + 360.0, h) / 2.0  # OpenCV: H/2 to fit uint8
    # cv2.cvtColor rounds H and S to uint8 (cvRound = round-half-to-even on
    # x86) BEFORE inRange compares them; unrounded floats would classify
    # boundary pixels (e.g. S in [39.5, 40)) differently from the reference.
    # Residual vs cv2: OpenCV computes H/S via 12-bit fixed-point division
    # tables, which disagrees with float-then-round on ~0.04% of random
    # pixels (measured; natural frames are lower) — well inside the scene
    # classifier's 0.15 threshold margin.
    h8 = jnp.round(h)
    s8 = jnp.round(s)
    in_range = (h8 >= 35) & (h8 <= 85) & (s8 >= 40) & (v >= 40)
    return jnp.mean(in_range.astype(jnp.float32))
