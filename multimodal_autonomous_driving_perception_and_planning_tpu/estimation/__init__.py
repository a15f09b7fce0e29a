from .ego import estimator_step, extract_state

__all__ = ["estimator_step", "extract_state"]
