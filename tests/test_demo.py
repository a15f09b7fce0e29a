"""CLI demo: console contract, --smooth-tracks, and the video writer."""

import numpy as np


def test_run_demo_console_contract_and_writer(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    from multimodal_autonomous_driving_perception_and_planning_tpu.apps.demo import (
        run_demo,
    )

    run_demo(
        num_frames=60,
        save_video=True,
        display=False,
        synthetic=True,
        use_frames=False,  # detections mode keeps the CPU run fast
        enable_tagging=True,
        smooth_tracks=True,
    )
    out = capsys.readouterr().out
    assert "Starting processing pipeline..." in out
    assert "Frame 50/60 | FPS:" in out and "Speed:" in out
    assert "Kalman bank: smoothing" in out
    assert "Demo Complete!" in out and "Processed 60 frames" in out

    # The writer actually wrote frames (reference bug: size mismatch
    # silently dropped every frame, demo.py:84-91).
    video = tmp_path / "output_demo.mp4"
    assert video.exists() and video.stat().st_size > 50_000

    import cv2

    cap = cv2.VideoCapture(str(video))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 60
    cap.release()


def test_run_demo_yolo_smoke(tmp_path, monkeypatch, capsys):
    """--yolo path (random init, small letterbox): the detector constructor
    regression (cfg passed positionally into mode) crashed this
    unconditionally; keep it covered end-to-end."""
    monkeypatch.chdir(tmp_path)
    from multimodal_autonomous_driving_perception_and_planning_tpu.apps.demo import (
        run_demo,
    )

    run_demo(
        num_frames=2,
        save_video=False,
        display=False,
        synthetic=True,
        use_frames=False,
        enable_tagging=False,
        yolo=True,
        yolo_img_size=160,  # CPU-affordable letterbox for the smoke test
    )
    out = capsys.readouterr().out
    assert "YOLO detector (weights: random init)" in out
    assert "Demo Complete!" in out and "Processed 2 frames" in out


def test_run_demo_with_video_file(tmp_path, monkeypatch, capsys):
    """The reference's primary CLI path: --video file -> VideoDataLoader ->
    full pipeline (frames mode) -> console summary."""
    import cv2

    from multimodal_autonomous_driving_perception_and_planning_tpu.data.frames import (
        SyntheticRoadGenerator,
    )

    # Author a small real mp4 from synthetic road frames.
    src = str(tmp_path / "road.mp4")
    gen = SyntheticRoadGenerator(640, 480)
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 30, (640, 480))
    for f in gen.generate_frames(12):
        w.write(f)
    w.release()

    monkeypatch.chdir(tmp_path)
    from multimodal_autonomous_driving_perception_and_planning_tpu.apps.demo import (
        run_demo,
    )

    run_demo(
        video_path=src,
        num_frames=10,
        save_video=False,
        display=False,
        use_frames=True,
        enable_tagging=True,
    )
    out = capsys.readouterr().out
    assert "Demo Complete!" in out and "Processed 10 frames" in out


def test_run_demo_segmented_resume_equals_monolithic(tmp_path, monkeypatch, capsys):
    """--save-state / --resume / --start-frame: two 8-frame segments chained
    through an orbax checkpoint must end in exactly the state one 16-frame
    run ends in (track table, Kalman state, tagging rings, frame counter —
    the full carry)."""
    monkeypatch.chdir(tmp_path)
    import jax
    import numpy as np

    from multimodal_autonomous_driving_perception_and_planning_tpu import (
        DEFAULT_CONFIG,
        initial_state,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.apps.demo import (
        run_demo,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.utils.checkpoint import (
        restore_pipeline_state,
    )

    common = dict(
        display=False,
        synthetic=True,
        use_frames=False,  # detections mode keeps the CPU run fast
        enable_tagging=True,
    )
    run_demo(num_frames=8, save_state=str(tmp_path / "seg1"), **common)
    run_demo(
        num_frames=8,
        start_frame=8,
        resume=str(tmp_path / "seg1"),
        save_state=str(tmp_path / "seg2"),
        **common,
    )
    run_demo(num_frames=16, save_state=str(tmp_path / "mono"), **common)
    out = capsys.readouterr().out
    assert "Resumed pipeline state" in out

    cfg = DEFAULT_CONFIG.replace(use_frames=False, enable_tagging=True)
    template = initial_state(cfg)
    seg = restore_pipeline_state(str(tmp_path / "seg2"), template)
    mono = restore_pipeline_state(str(tmp_path / "mono"), template)
    for path, a, b in zip(
        jax.tree_util.tree_leaves_with_path(seg)[0:],
        jax.tree_util.tree_leaves(seg),
        jax.tree_util.tree_leaves(mono),
    ):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=str(path[0])
        )


def test_run_multicamera_demo_smoke(tmp_path, monkeypatch, capsys):
    """--cameras N: the camera-sharded runner (shard_map + psum fleet
    reduction) as a CLI surface — grid video written, fleet counts printed."""
    monkeypatch.chdir(tmp_path)
    from multimodal_autonomous_driving_perception_and_planning_tpu.apps.demo import (
        run_multicamera_demo,
    )

    run_multicamera_demo(
        num_cameras=2, num_frames=12, save_video=True, display=False,
        enable_tagging=False,
    )
    out = capsys.readouterr().out
    assert "2 feeds through the camera-sharded runner" in out
    assert "Rendered 12 frames x 2 cameras" in out

    video = tmp_path / "output_multicam.mp4"
    assert video.exists() and video.stat().st_size > 10_000

    import cv2

    cap = cv2.VideoCapture(str(video))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 12
    cap.release()
