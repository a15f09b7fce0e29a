"""Gated end-to-end proof of the real-pretrained-weight path.

The converter numerics suite (test_converter_numerics.py) proves the
architecture + layout math against randomly initialized torch modules; it
deliberately downloads nothing.  What it cannot prove is that the genuine
artifacts — ultralytics ``yolov8n.pt`` (reference detector.py:103-123) and
``Salesforce/blip-image-captioning-base`` (reference vlm_tagger.py:119-156)
— produce real detections and captions through this framework.  These
tests close that gap, *gated on the checkpoints being present*:

    python tools/export_weights.py yolo yolov8n.pt -o checkpoints/yolov8n.npz
    python tools/export_weights.py blip Salesforce/blip-image-captioning-base \
        -o checkpoints/blip-base.npz        # also writes checkpoints/vocab.txt
    python -m pytest tests/test_real_weights.py -v

Without ``checkpoints/`` (or ``$MADPP_WEIGHTS_DIR``) the tests skip
cleanly.  Golden workflow: the first run against real weights records
``tests/goldens/real_weights.json`` and skips with a "recorded" notice;
commit that file and every later run asserts detections/captions against
it (catching converter, preprocessing, or decode regressions on the real
artifact, not just on random init).
"""

import json
import os
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
WEIGHTS_DIR = Path(os.environ.get("MADPP_WEIGHTS_DIR", REPO / "checkpoints"))
GOLDEN_PATH = REPO / "tests" / "goldens" / "real_weights.json"

YOLO_NPZ = WEIGHTS_DIR / "yolov8n.npz"
BLIP_NPZ = WEIGHTS_DIR / "blip-base.npz"
BLIP_VOCAB = WEIGHTS_DIR / "vocab.txt"


def _load_goldens() -> dict:
    if GOLDEN_PATH.exists():
        return json.loads(GOLDEN_PATH.read_text())
    return {}


def _record_golden(key: str, value) -> None:
    goldens = _load_goldens()
    goldens[key] = value
    GOLDEN_PATH.parent.mkdir(parents=True, exist_ok=True)
    GOLDEN_PATH.write_text(json.dumps(goldens, indent=2, sort_keys=True))


def _fixed_frame() -> np.ndarray:
    """Deterministic 640x480 BGR synthetic road frame (frame 10 of the
    seeded generator — far enough in that vehicles are on screen)."""
    from multimodal_autonomous_driving_perception_and_planning_tpu.data.frames import (
        SyntheticRoadGenerator,
    )

    frames = SyntheticRoadGenerator(640, 480).generate_frames(11)
    return np.asarray(frames[10], np.uint8)


@pytest.mark.skipif(not YOLO_NPZ.exists(), reason=f"no {YOLO_NPZ}")
def test_yolov8n_real_weights_detect_golden():
    """demo --yolo's weight path on the genuine yolov8n checkpoint: the
    archive loads as variant 'n', detections on a fixed frame are sane,
    deterministic, and match the recorded golden."""
    from multimodal_autonomous_driving_perception_and_planning_tpu.perception.detector import (
        ObjectDetector,
    )

    det = ObjectDetector(mode="yolo", model_path=str(YOLO_NPZ))
    assert det.mode == "yolo", "real archive must not fall back to simulated"
    assert det.variant == "n"

    frame = _fixed_frame()
    dets = det.detect(frame)
    dets2 = ObjectDetector(mode="yolo", model_path=str(YOLO_NPZ)).detect(frame)

    # Structural sanity on real weights: finite boxes inside the frame,
    # confidences in (0, 1], COCO class ids.
    h, w = frame.shape[:2]
    for d in dets:
        x1, y1, x2, y2 = d.bbox
        assert np.isfinite([x1, y1, x2, y2]).all()
        assert -1 <= x1 <= x2 <= w + 1 and -1 <= y1 <= y2 <= h + 1
        assert 0.0 < d.confidence <= 1.0
        assert 0 <= d.class_id < 80

    # Determinism across independent loads.
    assert len(dets) == len(dets2)
    for a, b in zip(dets, dets2):
        assert a.class_id == b.class_id
        np.testing.assert_allclose(a.bbox, b.bbox, atol=1e-3)

    summary = [
        {
            "bbox": [round(float(v), 2) for v in d.bbox],
            "class_id": d.class_id,
            "confidence": round(d.confidence, 4),
        }
        for d in dets
    ]
    goldens = _load_goldens()
    if "yolov8n_synthetic_frame10" not in goldens:
        _record_golden("yolov8n_synthetic_frame10", summary)
        pytest.skip(f"golden recorded at {GOLDEN_PATH}; commit it and re-run")
    want = goldens["yolov8n_synthetic_frame10"]
    assert len(summary) == len(want)
    for got, exp in zip(summary, want):
        assert got["class_id"] == exp["class_id"]
        np.testing.assert_allclose(got["bbox"], exp["bbox"], atol=0.5)
        np.testing.assert_allclose(got["confidence"], exp["confidence"], atol=5e-3)


@pytest.mark.skipif(not YOLO_NPZ.exists(), reason=f"no {YOLO_NPZ}")
def test_yolov8n_real_weights_stream_matches_per_frame():
    """The fused streaming frontend (what demo --yolo actually runs) agrees
    with the per-frame host API on real weights."""
    from multimodal_autonomous_driving_perception_and_planning_tpu.perception.detector import (
        ObjectDetector,
    )

    det = ObjectDetector(mode="yolo", model_path=str(YOLO_NPZ))
    frame = _fixed_frame()
    per_frame = det.detect(frame)
    out = det.detect_stream(np.asarray(frame)[None])
    valid = np.asarray(out["valid"][0])
    boxes = np.asarray(out["bbox"][0])[valid]
    cls = np.asarray(out["class_id"][0])[valid]
    assert len(per_frame) == int(valid.sum())
    order = np.lexsort((boxes[:, 0], boxes[:, 1]))
    pf_boxes = np.asarray([d.bbox for d in per_frame], np.float32)
    pf_cls = np.asarray([d.class_id for d in per_frame])
    pf_order = np.lexsort((pf_boxes[:, 0], pf_boxes[:, 1]))
    np.testing.assert_allclose(
        boxes[order], pf_boxes[pf_order], atol=1e-2
    )
    np.testing.assert_array_equal(cls[order], pf_cls[pf_order])


@pytest.mark.skipif(
    not (BLIP_NPZ.exists() and BLIP_VOCAB.exists()),
    reason=f"no {BLIP_NPZ} (+vocab.txt)",
)
def test_blip_real_weights_caption_golden():
    """JAX-BLIP captioning on the genuine Salesforce checkpoint: loads
    without torch, produces a real deterministic caption on a fixed frame,
    matching the recorded golden token-for-token."""
    from multimodal_autonomous_driving_perception_and_planning_tpu.tagging.vlm import (
        VLMConfig,
        _JaxBlipBackend,
    )

    backend = _JaxBlipBackend(
        VLMConfig(model_name=str(BLIP_NPZ), max_new_tokens=20, num_beams=3)
    )
    frame = _fixed_frame()
    caption = backend.generate(frame, "a photo of", "")
    assert backend.load_error is None, backend.load_error
    assert caption and not caption.startswith("Model load failed")
    assert not caption.startswith("Generation error")
    # Real weights produce English text, not random-init token soup: the
    # caption must contain at least two multi-letter lowercase words.
    words = [t for t in caption.split() if len(t) >= 2 and t.isalpha()]
    assert len(words) >= 2, caption

    assert backend.generate(frame, "a photo of", "") == caption  # deterministic

    goldens = _load_goldens()
    if "blip_caption_synthetic_frame10" not in goldens:
        _record_golden("blip_caption_synthetic_frame10", caption)
        pytest.skip(f"golden recorded at {GOLDEN_PATH}; commit it and re-run")
    assert caption == goldens["blip_caption_synthetic_frame10"]


@pytest.mark.skipif(
    not (BLIP_NPZ.exists() and BLIP_VOCAB.exists()),
    reason=f"no {BLIP_NPZ} (+vocab.txt)",
)
def test_blip_real_weights_tagger_end_to_end():
    """VLMTagger with the jax backend on real weights: tag_frame returns
    populated VLMTags whose descriptions come from the model."""
    from multimodal_autonomous_driving_perception_and_planning_tpu.tagging.vlm import (
        VLMConfig,
        VLMTagger,
    )

    tagger = VLMTagger(
        VLMConfig(model_name=str(BLIP_NPZ), max_new_tokens=20), backend="jax"
    )
    tags = tagger.tag_frame(_fixed_frame(), frame_number=10, timestamp=0.33)
    assert tags.scene_description
    assert "load failed" not in tags.scene_description
    assert tags.frame_number == 10
