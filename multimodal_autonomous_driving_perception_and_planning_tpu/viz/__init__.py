from .bev import BEVRenderer
from .overlays import OverlayRenderer
from .draw import draw_detections, draw_lanes, draw_tracks

__all__ = [
    "BEVRenderer",
    "OverlayRenderer",
    "draw_detections",
    "draw_lanes",
    "draw_tracks",
]
