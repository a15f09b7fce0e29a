"""Multi-camera sharding over a virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_autonomous_driving_perception_and_planning_tpu import DEFAULT_CONFIG
from multimodal_autonomous_driving_perception_and_planning_tpu.data.synthetic import (
    ego_motion_stream,
    simulated_detection_stream,
)
from multimodal_autonomous_driving_perception_and_planning_tpu.parallel.mesh import (
    make_camera_mesh,
    make_multicamera_runner,
    stack_states,
)


def make_inputs(n_cameras, num_frames):
    dets = simulated_detection_stream(num_frames)
    ego = ego_motion_stream(num_frames, seed=0)
    # Same stream replicated per camera (content does not matter here).
    def rep(x):
        return jnp.broadcast_to(jnp.asarray(x), (n_cameras,) + np.asarray(x).shape)

    return {
        "bbox": rep(dets["bbox"]),
        "class_id": rep(dets["class_id"]),
        "confidence": rep(dets["confidence"]),
        "valid": rep(dets["valid"]),
        "ego_measurement": rep(ego.astype(np.float32)),
    }


def test_eight_camera_sharded_pipeline():
    n = len(jax.devices())
    assert n == 8, f"expected 8 virtual CPU devices, got {n}"
    cfg = DEFAULT_CONFIG.replace(use_frames=False, enable_tagging=False)
    mesh = make_camera_mesh(n)
    runner = make_multicamera_runner(cfg, mesh)
    states = stack_states(cfg, n)
    inputs = make_inputs(n, 30)
    final, outs, fleet = runner(states, inputs)
    assert np.asarray(outs["num_confirmed"]).shape == (n, 30)
    # All cameras see the same stream -> identical outputs per camera.
    nc = np.asarray(outs["num_confirmed"])
    assert (nc == nc[0]).all()
    # Fleet psum = per-camera count x n.
    np.testing.assert_array_equal(
        np.asarray(fleet["fleet_confirmed_per_frame"]), nc[0] * n
    )


def test_multicamera_matches_single_camera():
    cfg = DEFAULT_CONFIG.replace(use_frames=False, enable_tagging=False)
    mesh = make_camera_mesh(4)
    runner = make_multicamera_runner(cfg, mesh)
    states = stack_states(cfg, 4)
    inputs = make_inputs(4, 20)
    _, outs, _ = runner(states, inputs)

    from multimodal_autonomous_driving_perception_and_planning_tpu import (
        initial_state,
        make_sequence_runner,
    )

    single = make_sequence_runner(cfg, donate=False)
    dets = simulated_detection_stream(20)
    ego = ego_motion_stream(20, seed=0)
    _, souts = single(
        initial_state(cfg),
        {
            "bbox": jnp.asarray(dets["bbox"]),
            "class_id": jnp.asarray(dets["class_id"]),
            "confidence": jnp.asarray(dets["confidence"]),
            "valid": jnp.asarray(dets["valid"]),
            "ego_measurement": jnp.asarray(ego, jnp.float32),
        },
    )
    np.testing.assert_array_equal(
        np.asarray(outs["track_id"])[0], np.asarray(souts["track_id"])
    )
    np.testing.assert_allclose(
        np.asarray(outs["plan_costs"])[0],
        np.asarray(souts["plan_costs"]),
        rtol=1e-5,
    )


def test_tensor_parallel_yolo_matches_unsharded():
    """DP x TP sharded detection over a (data=2, model=4) mesh: GSPMD
    shards conv output channels + the frame batch; results must match the
    single-device detector."""
    import numpy as np

    from multimodal_autonomous_driving_perception_and_planning_tpu.models.yolov8 import (
        make_yolo_detector,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.parallel.tp import (
        make_sharded_yolo_detector,
        make_tp_mesh,
    )

    mesh = make_tp_mesh()
    assert mesh.shape["model"] > 1, "virtual device count must enable TP"
    init_fn, detect = make_sharded_yolo_detector(
        mesh, img_size=160, max_det=8, compute_dtype=jnp.float32
    )
    variables = init_fn(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, (4, 120, 160, 3)).astype(np.float32))
    out = detect(variables, frames)

    init_raw, detect_raw = make_yolo_detector(
        img_size=160, max_det=8, compute_dtype=jnp.float32
    )
    v_raw = init_raw(jax.random.PRNGKey(0))
    ref = jax.vmap(detect_raw, in_axes=(None, 0))(v_raw, frames)
    for k in out:
        np.testing.assert_allclose(
            np.asarray(out[k], np.float32),
            np.asarray(ref[k], np.float32),
            atol=1e-3,
            err_msg=k,
        )
