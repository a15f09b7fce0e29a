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
