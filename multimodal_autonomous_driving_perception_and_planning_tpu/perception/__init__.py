from .lanes import make_lane_step, fit_lane_polynomial

__all__ = ["make_lane_step", "fit_lane_polynomial"]
