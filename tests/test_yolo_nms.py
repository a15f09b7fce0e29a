"""YOLO model shapes/decode and NMS parity vs a numpy greedy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_autonomous_driving_perception_and_planning_tpu.models.yolov8 import (
    REG_MAX,
    STRIDES,
    YOLOv8,
    decode_predictions,
    letterbox,
    make_yolo_detector,
)
from multimodal_autonomous_driving_perception_and_planning_tpu.ops.nms import nms
from oracle import _iou


def oracle_nms(boxes, scores, classes, iou_t=0.45, score_t=0.25, class_aware=True):
    order = np.argsort(-scores, kind="stable")
    keep = []
    for i in order:
        if scores[i] <= score_t:
            continue
        ok = True
        for j in keep:
            if class_aware and classes[i] != classes[j]:
                continue
            if _iou(boxes[i], boxes[j]) > iou_t:
                ok = False
                break
        if ok:
            keep.append(i)
    return keep


def test_nms_matches_oracle_random():
    rng = np.random.default_rng(7)
    for trial in range(5):
        n = 200
        cx = rng.uniform(0, 600, n)
        cy = rng.uniform(0, 400, n)
        w = rng.uniform(20, 120, n)
        h = rng.uniform(20, 120, n)
        boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=1)
        scores = rng.uniform(0, 1, n)
        classes = rng.integers(0, 4, n)
        want = oracle_nms(boxes, scores, classes)
        got = nms(
            jnp.asarray(boxes, jnp.float32),
            jnp.asarray(scores, jnp.float32),
            jnp.asarray(classes, jnp.int32),
            max_det=n,
            pre_topk=n,
        )
        got_idx = np.asarray(got.valid)
        got_boxes = np.asarray(got.boxes)[got_idx]
        want_boxes = boxes[want]
        assert len(got_boxes) == len(want_boxes), trial
        np.testing.assert_allclose(got_boxes, want_boxes, atol=1e-3)


def test_nms_class_aware_keeps_overlapping_different_classes():
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8])
    res_aware = nms(boxes, scores, jnp.asarray([0, 1]), pre_topk=2, max_det=4)
    assert int(res_aware.valid.sum()) == 2
    res_same = nms(boxes, scores, jnp.asarray([0, 0]), pre_topk=2, max_det=4)
    assert int(res_same.valid.sum()) == 1


@pytest.fixture(scope="module")
def yolo_n():
    model = YOLOv8(num_classes=80, variant="n")
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, 640, 640, 3)))
    return model, variables


def test_yolov8n_output_shapes_and_params(yolo_n):
    model, variables = yolo_n
    outs = model.apply(variables, jnp.zeros((1, 640, 640, 3)))
    assert len(outs) == 3
    for (box, cls), stride in zip(outs, STRIDES):
        s = 640 // stride
        assert box.shape == (1, s, s, 4 * REG_MAX)
        assert cls.shape == (1, s, s, 80)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    # ultralytics yolov8n: ~3.15M params (w/o DFL buffer).
    assert 2.8e6 < n_params < 3.5e6, n_params


def test_decode_shapes_and_anchor_geometry(yolo_n):
    model, variables = yolo_n
    outs = model.apply(variables, jnp.zeros((1, 640, 640, 3)))
    boxes, cls = decode_predictions(outs, 640)
    n = sum((640 // s) ** 2 for s in STRIDES)  # 8400
    assert boxes.shape == (1, n, 4)
    assert cls.shape == (1, n, 80)
    b = np.asarray(boxes)[0]
    assert (b[:, 2] >= b[:, 0]).all() and (b[:, 3] >= b[:, 1]).all()
    # With zero logits, DFL expectation = 7.5 bins each side around anchors.
    # First anchor of the stride-8 scale is at (0.5, 0.5)*8.
    zero_outs = [(jnp.zeros_like(o[0]), o[1]) for o in outs]
    zb, _ = decode_predictions(zero_outs, 640)
    np.testing.assert_allclose(
        np.asarray(zb)[0, 0], [(0.5 - 7.5) * 8, (0.5 - 7.5) * 8, 64.0, 64.0], atol=1e-3
    )


def test_letterbox_geometry():
    img = jnp.zeros((480, 640, 3))
    padded, scale, (px, py) = letterbox(img, 640)
    assert padded.shape == (640, 640, 3)
    assert scale == 1.0 and px == 0 and py == 80
    # Padding rows keep the 114 fill value.
    assert float(padded[0, 0, 0]) == 114.0
    assert float(padded[80, 0, 0]) == 0.0


def test_detector_end_to_end_random_weights():
    init_fn, detect_fn = make_yolo_detector(max_det=16)
    variables = init_fn(jax.random.PRNGKey(0))
    frame = jnp.zeros((480, 640, 3), jnp.int32)
    out = jax.jit(lambda v, f: detect_fn(v, f))(variables, frame)
    assert out["bbox"].shape == (16, 4)
    assert out["valid"].dtype == bool
    # Random weights: any surviving boxes must be taxonomy-mapped ids.
    cls = np.asarray(out["class_id"])[np.asarray(out["valid"])]
    assert ((cls >= 0) & (cls < 8)).all()


def test_object_detector_api_modes():
    from multimodal_autonomous_driving_perception_and_planning_tpu.perception.detector import (
        ObjectDetector,
    )

    det = ObjectDetector(mode="simulated")
    frame = np.zeros((480, 640, 3), np.uint8)
    out = det.detect(frame)
    assert 3 <= len(out) <= 7
    assert out[0].class_name in (
        "car", "truck", "pedestrian", "cyclist", "motorcycle", "bus",
        "traffic_light", "stop_sign",
    )
    stream = det.detect_stream(np.zeros((4, 480, 640, 3), np.uint8))
    assert stream["bbox"].shape[0] == 4

    det_missing = ObjectDetector(mode="yolo", model_path="/no/such/weights.pt")
    assert det_missing.mode == "simulated"  # graceful fallback like the reference

    # No weights and no opt-in -> reference contract: simulated fallback.
    det_noweights = ObjectDetector(mode="yolo")
    assert det_noweights.mode == "simulated"

    # Random-init network is an explicit opt-in (offline test fixture).
    det_rand = ObjectDetector(mode="yolo", allow_random_init=True)
    assert det_rand.mode == "yolo"
    stream = det_rand.detect_stream(np.zeros((2, 480, 640, 3), np.uint8))
    assert stream["bbox"].shape == (2, 16, 4)


def test_yolo_stream_feeds_pipeline():
    """BASELINE config 3: YOLO-mode detections through track/estimate/plan."""
    import jax.numpy as jnp_

    from multimodal_autonomous_driving_perception_and_planning_tpu import (
        DEFAULT_CONFIG,
        initial_state,
        make_sequence_runner,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.data.synthetic import (
        ego_motion_stream,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.perception.detector import (
        ObjectDetector,
    )

    cfg = DEFAULT_CONFIG.replace(use_frames=False, enable_tagging=True)
    det = ObjectDetector(mode="yolo", cfg=cfg, allow_random_init=True)
    frames = np.zeros((6, 480, 640, 3), np.uint8)
    stream = det.detect_stream(frames)
    inputs = dict(stream)
    inputs["ego_measurement"] = jnp_.asarray(ego_motion_stream(6, seed=0), jnp_.float32)
    run = make_sequence_runner(cfg, donate=False)
    _, outs = run(initial_state(cfg), inputs)
    assert np.asarray(outs["plan_best"]).shape == (6,)


def test_fused_yolo_sequence_runner_matches_two_stage_chain():
    """BASELINE config 3, fused: frames -> YOLO -> tracker -> planner in
    one jitted dispatch must equal the two-dispatch chain (detect_stream
    then make_sequence_runner) bit-for-bit on track ids."""
    import jax
    import jax.numpy as jnp_

    from multimodal_autonomous_driving_perception_and_planning_tpu import (
        DEFAULT_CONFIG,
        initial_state,
        make_sequence_runner,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.data.synthetic import (
        ego_motion_stream,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.models.yolov8 import (
        make_yolo_detector,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.perception.detector import (
        make_yolo_sequence_runner,
    )

    cfg = DEFAULT_CONFIG.replace(use_frames=False, enable_tagging=False)
    # Low threshold so a random-init model yields real detections.
    # map_to_taxonomy off: a random-init model's argmax class is spatially
    # uniform, and if it lands on an unmapped COCO class the taxonomy
    # filter would drop every detection.
    init_fn, run = make_yolo_sequence_runner(
        cfg,
        batch=4,
        score_threshold=0.05,
        compute_dtype=jnp_.float32,
        map_to_taxonomy=False,
        img_size=160,
    )
    variables = init_fn(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    frames = jnp_.asarray(
        rng.integers(0, 255, (6, 480, 640, 3)).astype(np.float32)
    )
    ego = jnp_.asarray(ego_motion_stream(6, seed=0), jnp_.float32)
    final, outs = run(variables, initial_state(cfg), frames, ego)

    # Detections must actually flow into the tracker.
    _, detect_fn = make_yolo_detector(
        max_det=cfg.detector.max_detections,
        score_threshold=0.05,
        compute_dtype=jnp_.float32,
        map_to_taxonomy=False,
        img_size=160,
    )
    stream = jax.vmap(detect_fn, in_axes=(None, 0))(variables, frames)
    assert np.asarray(stream["valid"]).any(), "random-init must emit detections"

    inputs = {k: v for k, v in stream.items()}
    inputs["ego_measurement"] = ego
    two_stage = make_sequence_runner(cfg, donate=False)
    _, ref_outs = two_stage(initial_state(cfg), inputs)
    np.testing.assert_array_equal(
        np.asarray(outs["track_id"]), np.asarray(ref_outs["track_id"])
    )
    np.testing.assert_allclose(
        np.asarray(outs["plan_costs"]),
        np.asarray(ref_outs["plan_costs"]),
        rtol=1e-6,
    )


def test_nms_suppression_chain_fixpoint():
    """A chain a>b>c>d... where each suppresses the next forces multiple
    fixpoint rounds (kept, suppressed, kept, suppressed...)."""
    n = 12
    boxes = np.zeros((n, 4), np.float32)
    for i in range(n):
        boxes[i] = [i * 5.0, 0.0, i * 5.0 + 10.0, 10.0]  # 50% overlap chain
    scores = np.linspace(0.95, 0.5, n).astype(np.float32)
    classes = np.zeros(n, np.int32)
    want = oracle_nms(boxes, scores, classes, iou_t=0.3)
    got = nms(
        jnp.asarray(boxes),
        jnp.asarray(scores),
        jnp.asarray(classes),
        iou_threshold=0.3,
        max_det=n,
        pre_topk=n,
    )
    got_boxes = np.asarray(got.boxes)[np.asarray(got.valid)]
    np.testing.assert_allclose(got_boxes, boxes[want], atol=1e-3)
    assert len(want) == (n + 1) // 2  # alternating keep pattern


def test_nms_matches_oracle_large_pool_beyond_kernel_cap():
    """pre_topk > 512 takes the XLA-only route (ops/nms.py caps the Pallas
    keep-mask kernel at k <= 512 for VMEM); the public entry point must
    still match the sequential oracle there."""
    rng = np.random.default_rng(11)
    n = 1024
    cx = rng.uniform(0, 600, n)
    cy = rng.uniform(0, 400, n)
    w = rng.uniform(20, 120, n)
    h = rng.uniform(20, 120, n)
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=1)
    scores = rng.uniform(0, 1, n)
    classes = rng.integers(0, 4, n)
    want = oracle_nms(boxes, scores, classes)
    got = nms(
        jnp.asarray(boxes, jnp.float32),
        jnp.asarray(scores, jnp.float32),
        jnp.asarray(classes, jnp.int32),
        max_det=n,
        pre_topk=n,
    )
    got_boxes = np.asarray(got.boxes)[np.asarray(got.valid)]
    want_boxes = boxes[want]
    assert len(got_boxes) == len(want_boxes)
    np.testing.assert_allclose(got_boxes, want_boxes, atol=1e-3)


def test_stop_after_prefixes_match_full_network_intermediates():
    """The profiling truncation knob (YOLOv8.stop_after, tools/
    yolo_profile.py) must return exactly the activation the full network
    computes at that point — otherwise per-stage timings attribute the
    wrong program."""
    import jax

    from multimodal_autonomous_driving_perception_and_planning_tpu.models.yolov8 import (
        YOLOv8,
    )

    full = YOLOv8(variant="n", dtype=jnp.float32)
    x = jnp.asarray(
        np.random.default_rng(0).random((1, 64, 64, 3), np.float32)
    )
    variables = full.init(jax.random.PRNGKey(0), x)
    _, inter = full.apply(
        variables, x, capture_intermediates=lambda mdl, name: True
    )
    inter = inter["intermediates"]

    for block in ("b0", "b2", "b4", "b6", "b9"):
        got = YOLOv8(variant="n", dtype=jnp.float32, stop_after=block).apply(
            variables, x
        )
        want = inter[block]["__call__"][0]
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    o3, o4, o5 = YOLOv8(
        variant="n", dtype=jnp.float32, stop_after="neck"
    ).apply(variables, x)
    np.testing.assert_array_equal(
        np.asarray(o3), np.asarray(inter["n15"]["__call__"][0])
    )
    np.testing.assert_array_equal(
        np.asarray(o5), np.asarray(inter["n21"]["__call__"][0])
    )
