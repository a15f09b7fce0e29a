from .rules import (
    make_tagging_step,
    ROAD_TYPES,
    LATERAL,
    LONGITUDINAL,
    TURNING,
    INTERACTIONS,
    RISKS,
    CONDITIONS,
)

__all__ = [
    "make_tagging_step",
    "ROAD_TYPES",
    "LATERAL",
    "LONGITUDINAL",
    "TURNING",
    "INTERACTIONS",
    "RISKS",
    "CONDITIONS",
]
