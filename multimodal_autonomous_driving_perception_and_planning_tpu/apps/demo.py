"""Headless / windowed CLI demo.

Drop-in equivalent of the reference's demo.py:25-231 — same console
contract (init banner, progress line every 50 frames with FPS / track count
/ speed, final FPS summary, q/p keyboard control, side-by-side video
export) — driven by the fused TPU pipeline: frames are decoded into batches,
the whole chunk runs as one jitted scan on device, and visualization
consumes the outputs on host.

Also restores the `--test` smoke mode the reference README documents but
whose implementation was dropped (README.md:169-187 vs demo.py:201-224).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np


def _build_inputs(
    frames: np.ndarray,
    num_frames: int,
    dt: float,
    use_frames: bool,
    cfg,
    detector=None,
    start_frame: int = 0,
):
    import jax.numpy as jnp

    from ..data.synthetic import ego_motion_stream, simulated_detection_stream

    if detector is not None and detector.mode == "yolo":
        # Real YOLO weights (--yolo --weights path.npz): batch-detect the
        # whole frame stack on device, then feed the tables to the scan.
        if frames.shape[1] < 32 or frames.shape[2] < 32:
            raise ValueError(
                "YOLO mode needs real camera frames; got placeholder "
                f"{frames.shape[1]}x{frames.shape[2]} images (--no-lanes "
                "disables frame generation — drop it or use --video)"
            )
        dets = {k: np.asarray(v) for k, v in detector.detect_stream(frames).items()}
    else:
        dets = simulated_detection_stream(
            num_frames,
            height=cfg.frame_height,
            width=cfg.frame_width,
            capacity=cfg.detector.max_detections,
            start_frame_count=start_frame + 1,
        )
    # Generate-then-slice keeps the segment's measurements bit-identical to
    # the same rows of one monolithic stream (the chunk-chaining contract,
    # runtime/stream.py) — the noise draw order depends only on the seed.
    ego = ego_motion_stream(start_frame + num_frames, dt=dt, seed=0)[start_frame:]
    inputs = {k: jnp.asarray(v) for k, v in dets.items()}
    inputs["ego_measurement"] = jnp.asarray(ego, jnp.float32)
    if use_frames:
        # Ship uint8 — 4x fewer host->device bytes than int32 for
        # 640x480x3 frames; every device image op widens internally.
        inputs["frame"] = jnp.asarray(np.ascontiguousarray(frames, dtype=np.uint8))
    return dets, inputs


def _enable_persistent_compile_cache():
    """First compile of the frames pipeline is minutes on TPU; cache it."""
    import jax

    cache = Path.home() / ".cache" / "madpp_jax"
    cache.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    # 0, not a positive threshold: the tunnel backend compiles async
    # server-side, so client-observed compile is ~1 s even for the big
    # scan programs — a threshold would skip exactly the entries that
    # cut cold start from minutes to seconds (see bench.py).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def run_demo(
    video_path: str = None,
    num_frames: int = None,
    save_video: bool = False,
    display: bool = True,
    synthetic: bool = False,
    use_frames: bool = True,
    enable_tagging: bool = True,
    smooth_tracks: bool = False,
    yolo: bool = False,
    weights: str = None,
    yolo_img_size: int = 640,
    start_frame: int = 0,
    resume: str = None,
    save_state: str = None,
):
    import cv2
    import jax

    _enable_persistent_compile_cache()

    from .. import DEFAULT_CONFIG, initial_state, make_sequence_runner
    from ..data.frames import SyntheticRoadGenerator
    from ..host import extract_frame
    from ..viz import BEVRenderer, OverlayRenderer, draw_detections, draw_lanes, draw_tracks

    print("=" * 60)
    print("Multimodal Autonomous Driving Perception & Planning Demo (TPU)")
    print("=" * 60)

    cfg = DEFAULT_CONFIG.replace(use_frames=use_frames, enable_tagging=enable_tagging)

    print("\n[1/6] Initializing perception modules...")
    print("[2/6] Initializing tracking module...")
    print("[3/6] Initializing state estimation...")
    print("[4/6] Initializing motion planner...")
    print("      (all stages fuse into one jitted per-frame program)")
    print("[5/6] Initializing visualization...")
    bev = BEVRenderer(cfg.bev)
    overlay = OverlayRenderer()

    dt = 1.0 / 30.0
    if synthetic or video_path is None:
        n = num_frames or 300
        print(f"[6/6] Generating {n} synthetic road frames...")
        gen = SyntheticRoadGenerator(cfg.frame_width, cfg.frame_height)
        # YOLO mode consumes pixels even when the lane stack is off
        # (--no-lanes): never hand it the 1x1 placeholders.
        need_pixels = use_frames or yolo
        # Generate-then-slice: frame start_frame+i here is bit-identical to
        # frame start_frame+i of a run that started at 0 (segmented resume).
        frames = (
            gen.generate_frames(start_frame + n)[start_frame:]
            if need_pixels
            else np.zeros((n, 1, 1, 3), np.uint8)
        )
        total = n
    else:
        print(f"[6/6] Loading video: {video_path}")
        from ..data.video import VideoDataLoader

        try:
            loader = VideoDataLoader(
                video_path, target_size=(cfg.frame_width, cfg.frame_height)
            )
        except FileNotFoundError:
            print(f"\nError: Video file not found: {video_path}")
            sys.exit(1)
        except ValueError as e:
            print(f"\nError: Could not open video: {e}")
            sys.exit(1)
        print(
            f"      Video info: {loader.total_frames} frames, {loader.fps:.1f} FPS, "
            f"{loader.get_info()['width']}x{loader.get_info()['height']}"
        )
        avail = max(0, loader.total_frames - start_frame)
        total = avail if num_frames is None else min(num_frames, avail)
        dt = loader.dt
        frames = loader.load_frames(total, start=start_frame)
        total = len(frames)
        loader.release()

    print("\n" + "=" * 60)
    print("Starting processing pipeline...")
    print("=" * 60)

    detector = None
    if yolo:
        from ..perception.detector import ObjectDetector

        print(f"      YOLO detector (weights: {weights or 'random init'})")
        detector = ObjectDetector(
            mode="yolo",
            model_path=weights or "",
            cfg=cfg,
            img_size=yolo_img_size,
        )
    dets, inputs = _build_inputs(frames, total, dt, use_frames, cfg,
                                 detector=detector, start_frame=start_frame)
    runner = make_sequence_runner(cfg, donate=False)

    init = initial_state(cfg)
    if resume:
        # Continue a prior segment: the carry (track table, Kalman state,
        # lane EMA, tagging rings, frame counter) restores exactly, so
        # segment N+1 is bit-identical to the same frames of one
        # monolithic run (utils/checkpoint.py; chunk-chaining contract).
        from ..utils.checkpoint import restore_pipeline_state

        init = restore_pipeline_state(resume, init)
        print(f"      Resumed pipeline state from {resume}")

    # Compile and execute separately so the reported device rate is the
    # steady-state throughput, not skewed by the one-time XLA compile.
    t0 = time.time()
    compiled = runner.lower(init, inputs).compile()
    compile_time = time.time() - t0
    t0 = time.time()
    final, outs = compiled(init, inputs)
    jax.block_until_ready(outs["plan_best"])
    device_time = time.time() - t0
    outs = jax.device_get(outs)

    if save_state:
        from ..utils.checkpoint import save_pipeline_state

        save_pipeline_state(save_state, final)
        print(f"      Saved pipeline state to {save_state} "
              f"(resume with --resume {save_state} "
              f"--start-frame {start_frame + total})")

    smoothed = None
    if smooth_tracks:
        # Opt-in per-agent Kalman bank (no reference analog; see
        # tracking/kalman_bank.py) — smoothed centers drawn as yellow dots.
        from ..tracking.kalman_bank import make_kalman_bank

        bank = make_kalman_bank(cfg)
        smoothed = jax.device_get(
            bank(
                {
                    k: outs[k]
                    for k in (
                        "track_id",
                        "track_bbox",
                        "track_velocity",
                        "track_vel_count",
                    )
                }
            )
        )
        n_smoothed = int(smoothed["valid"].any(axis=0).sum())
        print(f"Kalman bank: smoothing {n_smoothed} track slots on device")
    print(
        f"Device scan: {total} frames in {device_time*1e3:.1f} ms "
        f"({total/max(device_time,1e-9):.0f} frames/s on "
        f"{jax.devices()[0].platform.upper()}; compile {compile_time:.1f}s, cached)"
    )

    # The writer is opened lazily at the first composed frame so its size
    # always matches (the reference hardcodes 1240x480 against 1400x600
    # side-by-side frames and silently drops every frame, demo.py:84-91).
    video_writer = None
    out_path = Path("output_demo.mp4")
    if save_video:
        print(f"\nSaving video to: {out_path}")

    frame_times = []
    start = time.time()
    for f in range(total):
        fs = time.time()
        res = extract_frame(outs, dets, f)

        camera = frames[f].copy() if use_frames else np.zeros(
            (cfg.frame_height, cfg.frame_width, 3), np.uint8
        )
        camera = draw_detections(camera, res.detections)
        camera = draw_lanes(camera, res.lane_left, res.lane_right)
        camera = draw_tracks(camera, res.tracks)
        if smoothed is not None:
            for x, y in smoothed["positions"][f][smoothed["valid"][f]]:
                cv2.circle(camera, (int(x), int(y)), 4, (0, 255, 255), -1)
        fps = 1.0 / (frame_times[-1] if frame_times else 0.033)
        camera = overlay.draw_info_panel(camera, res.vehicle_state, fps=fps, frame_num=f)
        camera = overlay.draw_detection_summary(camera, res.detections)
        if res.lane_offset is not None:
            camera = overlay.draw_lane_offset_indicator(camera, res.lane_offset)

        bev_img = bev.render(
            ego_state=res.vehicle_state,
            tracks=res.tracks,
            planned_trajectory=res.optimal_trajectory,
            candidate_trajectories=res.candidate_trajectories[:10],
            show_grid=True,
        )
        combined = overlay.create_side_by_side(
            camera, bev_img, ("Camera View", "Bird's Eye View")
        )

        if display:
            cv2.imshow("Multimodal AV Demo (TPU)", combined)
            key = cv2.waitKey(1) & 0xFF
            if key == ord("q"):
                print("\nUser interrupted.")
                break
            if key == ord("p"):
                print("Paused. Press any key to continue...")
                cv2.waitKey(0)
        if save_video:
            if video_writer is None:
                video_writer = cv2.VideoWriter(
                    str(out_path),
                    cv2.VideoWriter_fourcc(*"mp4v"),
                    # Source rate, not a hardcoded 30: a 25/60 fps input
                    # would otherwise play 20% fast / 2x slow.
                    round(1.0 / dt) if dt > 0 else 30.0,
                    (combined.shape[1], combined.shape[0]),
                )
            video_writer.write(combined)

        frame_times.append(time.time() - fs)
        if (f + 1) % 50 == 0:
            avg_fps = 1.0 / np.mean(frame_times[-50:])
            print(
                f"Frame {f + 1}/{total} | "
                f"FPS: {avg_fps:.1f} | "
                f"Tracks: {len(res.tracks)} | "
                f"Speed: {res.vehicle_state.speed * 3.6:.1f} km/h"
            )

    if video_writer is not None:
        video_writer.release()
    if display:
        cv2.destroyAllWindows()

    wall = time.time() - start
    n_done = len(frame_times)
    print("\n" + "=" * 60)
    print("Demo Complete!")
    print("=" * 60)
    print(f"Processed {n_done} frames in {wall:.2f} seconds")
    print(f"Average FPS: {n_done / wall if wall > 0 else 0:.1f} (host render loop)")
    print(f"Average frame time: {np.mean(frame_times) * 1000:.1f} ms")
    print(
        f"Device pipeline: {total / max(device_time, 1e-9):.1f} frames/s "
        f"(detect+lane+track+estimate+plan+tag)"
    )
    if save_video:
        print("\nVideo saved to: output_demo.mp4")


def run_multicamera_demo(
    num_cameras: int = 4,
    num_frames: int = None,
    save_video: bool = False,
    display: bool = True,
    enable_tagging: bool = True,
):
    """Multi-camera rig demo: C distinct synthetic feeds through the
    camera-sharded runner (parallel/mesh.py shard_map — vmap within a
    device, psum fleet reduction across the mesh), rendered as a BEV grid.
    On a multi-chip mesh the same code shards cameras across chips; on one
    chip it vmaps.  No reference analog (the reference is single-stream);
    this is the multicamera axis as a user surface rather than a bench."""
    import cv2
    import jax

    _enable_persistent_compile_cache()

    from .. import DEFAULT_CONFIG
    from ..data.synthetic import ego_motion_stream, simulated_detection_stream
    from ..host import extract_frame
    from ..parallel.mesh import make_camera_mesh, make_multicamera_runner, stack_states
    from ..viz import BEVRenderer

    C = int(num_cameras)
    T = num_frames or 120
    cfg = DEFAULT_CONFIG.replace(use_frames=False, enable_tagging=enable_tagging)

    print("=" * 60)
    print(f"Multi-camera demo: {C} feeds through the camera-sharded runner")
    print("=" * 60)

    # Distinct deterministic feeds per camera: the detection stream is
    # counter-keyed, so disjoint counter ranges give unrelated traffic.
    per_cam_dets = [
        simulated_detection_stream(
            T,
            height=cfg.frame_height,
            width=cfg.frame_width,
            capacity=cfg.detector.max_detections,
            start_frame_count=c * 100_000 + 1,
        )
        for c in range(C)
    ]
    dets = {k: np.stack([d[k] for d in per_cam_dets]) for k in per_cam_dets[0]}
    ego = np.stack(
        [ego_motion_stream(T, dt=1.0 / 30.0, seed=c) for c in range(C)]
    ).astype(np.float32)

    import jax.numpy as jnp

    inputs = {k: jnp.asarray(v) for k, v in dets.items()}
    inputs["ego_measurement"] = jnp.asarray(ego)

    # Largest device count that divides C: shard_map splits the camera axis
    # evenly across the mesh (1 chip -> vmap over all cameras).
    n_dev = max(d for d in range(1, len(jax.devices()) + 1) if C % d == 0)
    mesh = make_camera_mesh(n_dev)
    runner = make_multicamera_runner(cfg, mesh)
    states = stack_states(cfg, C)

    t0 = time.time()
    final, outs, fleet = runner(states, inputs)
    jax.block_until_ready(fleet["fleet_confirmed_per_frame"])
    device_time = time.time() - t0
    outs = jax.device_get(outs)
    fleet_counts = np.asarray(fleet["fleet_confirmed_per_frame"])
    print(
        f"Device scan: {C} cameras x {T} frames in {device_time*1e3:.1f} ms "
        f"({C*T/max(device_time,1e-9):.0f} frames/s aggregate on "
        f"{n_dev} device(s), incl. compile)"
    )

    bev = BEVRenderer(cfg.bev)
    cols = int(np.ceil(np.sqrt(C)))
    rows = int(np.ceil(C / cols))
    tile = 400
    video_writer = None
    out_path = Path("output_multicam.mp4")
    if save_video:
        print(f"Saving video to: {out_path}")

    outs_per_cam = [
        jax.tree_util.tree_map(lambda x, c=c: x[c], outs) for c in range(C)
    ]
    dets_per_cam = [{k: v[c] for k, v in dets.items()} for c in range(C)]
    start = time.time()
    for f in range(T):
        grid = np.zeros((rows * tile, cols * tile, 3), np.uint8)
        for c in range(C):
            res = extract_frame(outs_per_cam[c], dets_per_cam[c], f)
            img = bev.render(
                ego_state=res.vehicle_state,
                tracks=res.tracks,
                planned_trajectory=res.optimal_trajectory,
                candidate_trajectories=res.candidate_trajectories[:10],
                show_grid=True,
            )
            img = cv2.resize(img, (tile, tile))
            cv2.putText(img, f"cam {c}", (8, 22), cv2.FONT_HERSHEY_SIMPLEX,
                        0.6, (255, 255, 255), 1)
            r, col = divmod(c, cols)
            grid[r * tile:(r + 1) * tile, col * tile:(col + 1) * tile] = img
        cv2.putText(grid, f"frame {f}  fleet tracks: {int(fleet_counts[f])}",
                    (8, rows * tile - 10), cv2.FONT_HERSHEY_SIMPLEX, 0.6,
                    (0, 255, 0), 1)
        if display:
            cv2.imshow("Multi-camera BEV grid (TPU)", grid)
            if (cv2.waitKey(1) & 0xFF) == ord("q"):
                break
        if save_video:
            if video_writer is None:
                video_writer = cv2.VideoWriter(
                    str(out_path), cv2.VideoWriter_fourcc(*"mp4v"), 30.0,
                    (grid.shape[1], grid.shape[0]),
                )
            video_writer.write(grid)
        if (f + 1) % 50 == 0:
            print(f"Frame {f+1}/{T} | fleet tracks: {int(fleet_counts[f])}")
    host_time = time.time() - start
    if video_writer is not None:
        video_writer.release()
        print(f"Video saved: {out_path}")
    if display:
        cv2.destroyAllWindows()
    print(f"Rendered {T} frames x {C} cameras in {host_time:.2f}s (host grid loop)")


def run_component_test():
    """The six-component smoke suite the reference README documents."""
    import jax
    import jax.numpy as jnp

    from .. import DEFAULT_CONFIG, initial_state, make_pipeline_step
    from ..data.frames import SyntheticRoadGenerator
    from ..data.synthetic import simulated_detection_stream
    from ..pipeline import detections_from_arrays
    from ..perception.lanes import make_lane_step
    from ..types import LaneState
    from ..viz import BEVRenderer

    print("Running component tests...\n")
    cfg = DEFAULT_CONFIG.replace(use_frames=False, enable_tagging=True)

    dets = simulated_detection_stream(1)
    assert dets["valid"][0].sum() >= 3
    print("[Test 1] Object Detector ✓")

    gen = SyntheticRoadGenerator()
    lane_step = jax.jit(make_lane_step(DEFAULT_CONFIG))
    _, obs, _ = lane_step(LaneState.initial(), jnp.asarray(gen.generate_frame_with_vehicles()))
    assert bool(obs.left_found) and bool(obs.right_found)
    print("[Test 2] Lane Detector ✓")

    step = jax.jit(make_pipeline_step(cfg))
    state = initial_state(cfg)
    frame0 = {k: v[0] for k, v in dets.items()}
    inputs = {
        "detections": detections_from_arrays(frame0),
        "ego_measurement": jnp.asarray([0.33, 0.0, 10.0, 0.0], jnp.float32),
    }
    state, out = step(state, inputs)
    assert int(state.tracks.next_id) > 1
    print("[Test 3] Multi-Object Tracker ✓")

    assert float(out["vehicle_state"].speed) >= 0
    print("[Test 4] State Estimator ✓")

    assert int(out["plan_best"]) >= 0 and out["plan_costs"].shape[0] == 21
    print("[Test 5] Motion Planner ✓")

    bev = BEVRenderer()
    img = bev.render()
    assert img.shape == (600, 600, 3)
    print("[Test 6] BEV Renderer ✓")

    print("\nAll component tests passed.")


def main(argv=None):
    from ..utils.platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser(
        description="Multimodal AV Perception & Planning Demo (TPU-native)"
    )
    parser.add_argument("--video", type=str, default=None,
                        help="Path to input video file")
    parser.add_argument("--synthetic", action="store_true",
                        help="Use the synthetic road-scene generator")
    parser.add_argument("--frames", type=int, default=None,
                        help="Number of frames to process (default: all)")
    parser.add_argument("--save-video", action="store_true",
                        help="Save output to output_demo.mp4")
    parser.add_argument("--no-display", action="store_true",
                        help="Don't open a display window")
    parser.add_argument("--no-lanes", action="store_true",
                        help="Skip on-device lane detection / scene features")
    parser.add_argument("--no-tagging", action="store_true",
                        help="Skip the on-device tagging stage")
    parser.add_argument("--smooth-tracks", action="store_true",
                        help="Opt-in per-agent Kalman smoothing bank "
                             "(yellow dots = smoothed track centers)")
    parser.add_argument("--test", action="store_true",
                        help="Run the six-component smoke test and exit")
    parser.add_argument("--yolo", action="store_true",
                        help="Detect with the on-device YOLOv8 instead of "
                             "the simulated detector")
    parser.add_argument("--weights", type=str, default=None,
                        help="YOLO weights: .npz from tools/export_weights.py "
                             "or a torch state_dict .pt")
    parser.add_argument("--img-size", type=int, default=640,
                        help="YOLO letterbox size (speed/accuracy knob)")
    parser.add_argument("--cameras", type=int, default=1,
                        help="Run N synthetic camera feeds through the "
                             "camera-sharded runner and render a BEV grid")
    parser.add_argument("--start-frame", type=int, default=0,
                        help="First frame index to process (segmented runs)")
    parser.add_argument("--resume", type=str, default=None,
                        help="Restore the pipeline carry saved by "
                             "--save-state and continue from it")
    parser.add_argument("--save-state", type=str, default=None,
                        help="Save the final pipeline carry (orbax) for "
                             "--resume")
    args = parser.parse_args(argv)

    if args.test:
        run_component_test()
        return

    if args.cameras > 1:
        run_multicamera_demo(
            num_cameras=args.cameras,
            num_frames=args.frames,
            save_video=args.save_video,
            display=not args.no_display,
            enable_tagging=not args.no_tagging,
        )
        return

    if args.video is None and not args.synthetic:
        # The reference README documents bare ``python demo.py`` running on
        # synthetic data (README.md:69-75; its shipped demo.py regressed to
        # requiring --video).  Implement the documented behavior.
        print("No --video given; using the synthetic road-scene generator.")
        args.synthetic = True

    run_demo(
        video_path=args.video,
        num_frames=args.frames,
        save_video=args.save_video,
        display=not args.no_display,
        synthetic=args.synthetic,
        use_frames=not args.no_lanes,
        enable_tagging=not args.no_tagging,
        smooth_tracks=args.smooth_tracks,
        yolo=args.yolo,
        weights=args.weights,
        yolo_img_size=args.img_size,
        start_frame=args.start_frame,
        resume=args.resume,
        save_state=args.save_state,
    )


if __name__ == "__main__":
    main()
