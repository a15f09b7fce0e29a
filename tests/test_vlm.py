"""VLM tagger: keyword extraction, risk parsing, caching, search (stub
backend; BLIP path is exercised when weights are available)."""

import numpy as np

from multimodal_autonomous_driving_perception_and_planning_tpu.config import VLMConfig
from multimodal_autonomous_driving_perception_and_planning_tpu.tagging.vlm import (
    VLMTagger,
    extract_tags,
    infer_road_type,
    infer_time_of_day,
    infer_weather,
    parse_risk,
)


class FakeState:
    def __init__(self, speed=10.0, acceleration=0.0):
        self.speed = speed
        self.acceleration = acceleration


class FakeTrack:
    def __init__(self, class_name="car"):
        self.class_name = class_name


def test_keyword_extraction_tables():
    tags = extract_tags(
        "a busy city street at night with a truck and a cyclist in heavy traffic",
        "this driving situation is dangerous, caution needed",
    )
    for want in ("urban", "night", "trucks", "cyclists", "heavy_traffic", "potential_hazard"):
        assert want in tags, (want, tags)


def test_risk_parse_cascade():
    assert parse_risk("extremely dangerous, collision imminent")[0] == "critical"
    assert parse_risk("this is unsafe and hazardous")[0] == "high"
    # "risk" itself hits the high tier first (reference cascade order makes
    # "some risk"/"moderate risk" unreachable as medium).
    assert parse_risk("moderate risk, be careful")[0] == "high"
    assert parse_risk("moderate conditions, attention required")[0] == "medium"
    assert parse_risk("all clear and calm")[0] == "low"


def test_inference_helpers():
    assert infer_road_type("a highway at dusk") == "highway"
    # Note: "suburban" would match the earlier 'urban' substring check, a
    # reference quirk we keep (vlm_tagger.py:274).
    assert infer_road_type("a residential neighborhood") == "residential"
    assert infer_weather("rain on the windshield") == "rainy"
    assert infer_time_of_day("a dark evening road") == "night"


def test_tagger_cache_interval_and_context_tags():
    tagger = VLMTagger(VLMConfig(cache_interval=5), backend="stub")
    frame = np.full((48, 64, 3), 120, np.uint8)
    state = FakeState(speed=0.5, acceleration=-4.0)
    tracks = [FakeTrack() for _ in range(6)] + [FakeTrack("pedestrian")]

    t0 = tagger.tag_frame(frame, state, tracks)
    assert "stopped" in t0.extracted_tags  # 1.8 km/h < 5
    assert "hard_braking" in t0.extracted_tags
    assert "heavy_traffic" in t0.extracted_tags
    assert "pedestrians_present" in t0.extracted_tags
    assert t0.confidence == 0.8

    # Frames 1-4 come from the cache (same description, updated index).
    t1 = tagger.tag_frame(frame, state, tracks)
    assert t1.frame_idx == 1
    assert t1.scene_description == t0.scene_description
    for _ in range(3):
        tagger.tag_frame(frame, state, tracks)  # idx 2, 3, 4: cached
    assert len(tagger.tag_history) == 1
    t5 = tagger.tag_frame(frame, state, tracks)  # idx 5: recompute
    assert t5.frame_idx == 5
    assert len(tagger.tag_history) == 2


def test_tagger_search_and_stats():
    tagger = VLMTagger(VLMConfig(cache_interval=1), backend="stub")
    frame = np.full((48, 64, 3), 120, np.uint8)
    for i in range(8):
        tagger.tag_frame(frame, FakeState(speed=10.0), [FakeTrack()] * (i % 3))
    stats = tagger.get_statistics()
    assert stats["total_frames"] == 8
    assert stats["unique_tags"] >= 1
    hits = tagger.search_by_description("driving scene")
    assert len(hits) == 8
    tagger.reset()
    assert tagger.get_statistics() == {}


def test_blip_backend_falls_back_gracefully():
    """With no downloadable weights the auto backend must fall back to the
    stub captions rather than emitting error strings."""
    tagger = VLMTagger(VLMConfig(cache_interval=1), backend="auto")
    frame = np.full((48, 64, 3), 120, np.uint8)
    t = tagger.tag_frame(frame, FakeState(), [])
    assert "error" not in t.scene_description.lower()
    assert t.scene_description
