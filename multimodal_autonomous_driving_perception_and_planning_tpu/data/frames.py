"""Synthetic road-scene frame generator.

Host-side rebuild of the reference's deleted SyntheticDataGenerator
(recovered interface: data/generators/__pycache__/synthetic_data.cpython-312.pyc;
see SURVEY.md section 2.1): vanishing-point road frames with lane markings,
environment, and simple vehicles, so the full image pipeline runs with no
real footage.  Returns BGR uint8 frames like cv2 would decode.

Geometry is chosen to exercise the lane detector: lane lines run from the
bottom corners toward a vanishing point, with |slope| 1.0 inside the ROI
trapezoid (lane_detector.py:47-64) and known ground-truth positions that
tests assert against.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover - cv2 is present in this environment
    cv2 = None


class SyntheticRoadGenerator:
    """Vanishing-point synthetic road scenes.

    Ground truth: left lane from (0.15w, h) to vp, right lane from
    (0.85w, h) to vp, vp at (0.5w, 0.45h).  Dashes scroll with frame index.
    """

    def __init__(
        self,
        width: int = 640,
        height: int = 480,
        fps: float = 30.0,
        draw_adjacent_dash: bool = False,
    ):
        self.width = width
        self.height = height
        self.fps = fps
        self.frame_count = 0
        self.draw_adjacent_dash = draw_adjacent_dash
        self.vp = (int(width * 0.5), int(height * 0.45))
        # The ego drives inside its lane: markings at the lane edges, not
        # under the camera (a centered dash would straddle w/2 and bleed
        # near-vertical segments into both lane fits).
        self.left_base = (int(width * 0.15), height)
        self.right_base = (int(width * 0.85), height)

    # -- ground truth for tests -------------------------------------------
    def lane_x_at(self, side: str, y: float) -> float:
        """Ground-truth lane x at image row y (linear to the vanishing pt)."""
        bx, by = self.left_base if side == "left" else self.right_base
        vx, vy = self.vp
        t = (y - by) / (vy - by)
        return bx + t * (vx - bx)

    # -- drawing -----------------------------------------------------------
    def generate_road_frame(self) -> np.ndarray:
        w, h = self.width, self.height
        frame = np.zeros((h, w, 3), np.uint8)
        horizon = self.vp[1]

        self._draw_environment(frame, horizon)

        # Road surface: trapezoid between lane bases and vanishing point.
        road = np.array(
            [
                [self.left_base[0] - 30, h],
                [self.vp[0] - 8, horizon],
                [self.vp[0] + 8, horizon],
                [self.right_base[0] + 30, h],
            ],
            np.int32,
        )
        cv2.fillPoly(frame, [road], (60, 60, 60))

        self._draw_lane_markings(frame, self.vp[0], self.vp[1])
        return frame

    def _draw_environment(self, frame: np.ndarray, horizon_y: int) -> None:
        w = self.width
        # Sky gradient.
        for y in range(horizon_y):
            shade = 200 - int(60 * y / max(1, horizon_y))
            frame[y, :] = (min(255, shade + 55), shade, max(0, shade - 30))
        # Grass.
        frame[horizon_y:, :] = (40, 110, 50)

    def _draw_lane_markings(self, frame: np.ndarray, vp_x: int, vp_y: int) -> None:
        h = self.height
        # Solid ego-lane edge lines.
        for base in (self.left_base, self.right_base):
            cv2.line(frame, base, (vp_x, vp_y), (240, 240, 240), 5)
        # Optional adjacent-lane dashed marking (scrolls with the frame
        # counter), converging to the same vanishing point.
        if self.draw_adjacent_dash:
            base_x = int(self.width * 0.02)
            phase = (self.frame_count * 8) % 40
            for i in range(14):
                t0 = (i * 40 + phase) / 560.0
                t1 = t0 + 20 / 560.0
                if t1 >= 1.0:
                    continue
                p0 = (
                    int(base_x + t0 * (vp_x - base_x)),
                    int(h - t0 * (h - vp_y)),
                )
                p1 = (
                    int(base_x + t1 * (vp_x - base_x)),
                    int(h - t1 * (h - vp_y)),
                )
                cv2.line(frame, p0, p1, (230, 230, 230), 3)

    def generate_vehicle(
        self,
        frame: np.ndarray,
        x: int,
        y: int,
        scale: float = 1.0,
        color: Tuple[int, int, int] = (30, 30, 160),
    ) -> None:
        bw, bh = int(80 * scale), int(55 * scale)
        cv2.rectangle(frame, (x, y - bh), (x + bw, y), color, -1)
        cv2.rectangle(
            frame,
            (x + bw // 6, y - bh + 4),
            (x + 5 * bw // 6, y - bh // 2),
            (150, 200, 220),
            -1,
        )

    def generate_frame_with_vehicles(self) -> np.ndarray:
        frame = self.generate_road_frame()
        t = self.frame_count * 0.05
        # Two vehicles weaving ahead.
        for i, (lane_t, speed) in enumerate(((0.35, 0.9), (0.62, 0.6))):
            depth = 0.35 + 0.25 * (0.5 + 0.5 * np.sin(t * speed + i * 2))
            y = int(self.height - depth * (self.height - self.vp[1]))
            scale = max(0.25, 1.2 * (1 - depth))
            x = int(
                self.left_base[0]
                + lane_t * (self.right_base[0] - self.left_base[0]) * (1 - depth)
                + depth * (self.vp[0] - 40)
            )
            self.generate_vehicle(frame, x, y, scale)
        self.frame_count += 1
        return frame

    def generate_video_stream(self, num_frames: int):
        for _ in range(num_frames):
            yield self.generate_frame_with_vehicles()

    def generate_frames(self, num_frames: int) -> np.ndarray:
        """(T, H, W, 3) uint8 stacked frames."""
        return np.stack(list(self.generate_video_stream(num_frames)))

    def generate_ego_motion(self, num_steps: Optional[int] = None):
        # seed=None: the reference draws from the current global RNG state
        # (no reseeding side effect) — same contract as
        # VideoDataLoader.generate_ego_motion (video_loader.py:166-205).
        from .synthetic import ego_motion_stream

        return ego_motion_stream(num_steps or 300, dt=1.0 / self.fps, seed=None)

    def reset(self) -> None:
        self.frame_count = 0
