"""Image-op parity vs OpenCV on synthetic road frames."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_autonomous_driving_perception_and_planning_tpu.data.frames import (
    SyntheticRoadGenerator,
)
from multimodal_autonomous_driving_perception_and_planning_tpu.ops.image import (
    bgr_to_gray_u8,
    bgr_to_hsv_green_ratio,
    canny,
    gaussian_blur5_u8,
    laplacian_variance,
    median_u8,
    trapezoid_roi_mask,
)


@pytest.fixture(scope="module")
def frame():
    gen = SyntheticRoadGenerator()
    return gen.generate_frame_with_vehicles()


def test_gray_matches_cv2_bitexact(frame):
    want = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
    got = np.asarray(bgr_to_gray_u8(jnp.asarray(frame)))
    np.testing.assert_array_equal(got, want.astype(np.int32))


def test_gaussian_blur_matches_cv2_within_1lsb(frame):
    gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
    want = cv2.GaussianBlur(gray, (5, 5), 0).astype(np.int32)
    got = np.asarray(gaussian_blur5_u8(jnp.asarray(gray.astype(np.int32))))
    diff = np.abs(got - want)
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.02  # <2% of pixels off by the rounding LSB


def test_median_matches_numpy(frame):
    gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
    blurred = cv2.GaussianBlur(gray, (5, 5), 0)
    want = float(np.median(blurred))
    got = float(median_u8(jnp.asarray(blurred.astype(np.int32))))
    assert got == want


def test_canny_overlaps_cv2(frame):
    """Edge-map parity is defined loosely (SURVEY section 7): most cv2 edges
    must be within 1 px of ours and vice versa."""
    gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
    blurred = cv2.GaussianBlur(gray, (5, 5), 0)
    med = np.median(blurred)
    low = int(max(0, 0.7 * med))
    high = int(min(255, 1.3 * med))
    want = cv2.Canny(blurred, low, high) > 0
    got = np.asarray(
        canny(jnp.asarray(blurred.astype(np.int32)), jnp.float32(low), jnp.float32(high))
    )
    kernel = np.ones((3, 3), np.uint8)
    want_d = cv2.dilate(want.astype(np.uint8), kernel) > 0
    got_d = cv2.dilate(got.astype(np.uint8), kernel) > 0
    # Coverage both ways.
    assert (got & want_d).sum() / max(1, got.sum()) > 0.9
    assert (want & got_d).sum() / max(1, want.sum()) > 0.9


def test_roi_mask_matches_fillpoly():
    h, w = 480, 640
    vertices = np.array(
        [[(int(w * 0.1), h), (int(w * 0.4), int(h * 0.6)), (int(w * 0.6), int(h * 0.6)), (int(w * 0.9), h)]],
        np.int32,
    )
    want = np.zeros((h, w), np.uint8)
    cv2.fillPoly(want, vertices, 255)
    got = np.asarray(trapezoid_roi_mask(h, w))
    agree = (got == (want > 0)).mean()
    assert agree > 0.995  # boundary-pixel differences only


def test_laplacian_variance_close(frame):
    gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
    want = cv2.Laplacian(gray, cv2.CV_64F).var()
    got = float(laplacian_variance(jnp.asarray(gray.astype(np.int32))))
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_green_ratio_close(frame):
    hsv = cv2.cvtColor(frame, cv2.COLOR_BGR2HSV)
    mask = cv2.inRange(hsv, (35, 40, 40), (85, 255, 255))
    want = (mask > 0).mean()
    got = float(bgr_to_hsv_green_ratio(jnp.asarray(frame)))
    # H/S are rounded to uint8 like cv2 before the range compare; the
    # residual is cv2's fixed-point division tables (~0.04% of pixels).
    np.testing.assert_allclose(got, want, atol=0.002)
