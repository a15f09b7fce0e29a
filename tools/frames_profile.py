#!/usr/bin/env python
"""Stage-by-stage on-device profile of the frames (full-image) path.

Isolates every stage of the per-frame image stack the frames-mode
pipeline runs (perception/lanes.py: gray -> blur -> median -> Canny ->
ROI/compaction -> Hough -> fit, plus the scene-feature half at both
full and reduced resolution), each measured with the suite's
nonce+digest methodology (benchmarks/suite.py): chained reps inside one
jitted call so XLA cannot hoist loop-invariant work, timing to a forced
readback, dispatch floor measured and netted out.

Stage inputs are precomputed device stacks (the real intermediates of
the synthetic stream), so data-dependent costs (Canny hysteresis
iterations, compaction totals) reflect the same frames bench_frames
times.  One process; run alone on the chip.

Usage:  python tools/frames_profile.py [--frames 120] [--repeats 6]
Prints one JSON line per stage: {"stage": ..., "us_per_frame": ...}.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "benchmarks"))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=120)
    parser.add_argument("--repeats", type=int, default=6)
    parser.add_argument(
        "--reps-scale", type=float, default=1.0,
        help="scale every stage's inner rep count (CPU smoke: 0.01)",
    )
    parser.add_argument(
        "--only", type=str, default="",
        help="comma-separated stage names to run (default: all); each "
        "skipped stage still avoids its compile, so a targeted re-measure "
        "fits inside one tunnel window",
    )
    args = parser.parse_args()

    from multimodal_autonomous_driving_perception_and_planning_tpu.utils.platform import (
        apply_platform_env,
    )

    apply_platform_env()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import suite  # benchmarks/suite.py helpers

    suite._setup_cache()

    from multimodal_autonomous_driving_perception_and_planning_tpu import (
        DEFAULT_CONFIG,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.data.frames import (
        SyntheticRoadGenerator,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.ops import hough as oh
    from multimodal_autonomous_driving_perception_and_planning_tpu.ops import image as oi
    from multimodal_autonomous_driving_perception_and_planning_tpu.perception.lanes import (
        _separate_and_fit,
    )

    cfg = DEFAULT_CONFIG
    lc = cfg.lanes
    h, w = cfg.frame_height, cfg.frame_width
    F = args.frames

    print(f"# device: {jax.devices()}", flush=True)
    floor, floor_p50 = suite.measure_dispatch_floor(args.repeats)
    print(
        f"# dispatch_floor_ms: best={floor*1e3:.2f} p50={floor_p50*1e3:.2f}",
        flush=True,
    )

    frames = jnp.asarray(
        SyntheticRoadGenerator(w, h).generate_frames(F)
    )  # (F, H, W, 3) u8

    # ---- precompute the real intermediates once (not timed) -------------
    roi = oi.trapezoid_roi_mask(
        h, w, lc.roi_bottom_frac, lc.roi_top_frac, lc.roi_top_y_frac
    )

    @jax.jit
    def precompute(frames):
        def per_frame(_, frame):
            gray = oi.bgr_to_gray_u8(frame)
            blurred = oi.gaussian_blur5_u8(gray)
            med = oi.median_u8(blurred)
            low = jnp.floor(jnp.maximum(0.0, 0.7 * med))
            high = jnp.floor(jnp.minimum(255.0, 1.3 * med))
            edges = oi.canny(blurred, low, high)
            masked = edges & roi
            gray_s = oi.downsample2_u8(gray)
            edges_scene = oi.canny(gray_s, jnp.float32(50.0), jnp.float32(150.0))
            edges_scene_full = oi.canny(gray, jnp.float32(50.0), jnp.float32(150.0))
            hl = oh.hough_segments(
                masked,
                vote_threshold=lc.hough_threshold,
                min_line_length=lc.hough_min_line_length,
                num_thetas=lc.num_thetas,
                max_lines=lc.max_lines,
                edge_capacity=lc.lane_edge_capacity,
                row_range=(int(h * lc.roi_top_y_frac), h),
            )
            return None, dict(
                gray=gray, blurred=blurred, low=low, high=high, masked=masked,
                gray_s=gray_s, edges_scene=edges_scene,
                edges_scene_full=edges_scene_full,
                segments=hl.segments, seg_valid=hl.valid,
            )

        _, stacks = jax.lax.scan(per_frame, None, frames)
        return stacks

    stacks = precompute(frames)
    stacks["frame"] = frames
    stacks = jax.device_put(stacks)
    jax.block_until_ready(stacks)

    def u8_eps(img, eps):
        # Data-dependent term XLA cannot fold away; zero at runtime, so the
        # u8 content is bit-identical across reps.
        return img + eps.astype(img.dtype)

    only = {s.strip() for s in args.only.split(",") if s.strip()}

    def time_stage(name, keys, stage_fn, reps, extra=None):
        """stage_fn(xs: dict of per-frame inputs, eps) -> pytree output."""
        if only and name not in only:
            return 0.0
        reps = max(1, int(reps * args.reps_scale))
        sub = {k: stacks[k] for k in keys}

        def fn(nonce, sub):
            def one_rep(carry, _):
                digest_in, _ = carry
                eps = (nonce + digest_in) * 1e-30

                def per_frame(c, xs):
                    out = stage_fn(xs, eps)
                    return c + suite._tree_digest(out), None

                d, _ = jax.lax.scan(per_frame, jnp.float32(0.0), sub)
                return (digest_in + d, 0), None

            (digest, _), _ = jax.lax.scan(one_rep, (nonce, 0), None, length=reps)
            return digest

        f = jax.jit(fn)
        best, p50 = suite._time_digest(f, sub, repeats=args.repeats)
        net = max(best - floor, 1e-9)
        us = net / (F * reps) * 1e6
        rec = {
            "stage": name,
            "us_per_frame": round(us, 2),
            "reps": reps,
            "total_ms": round(best * 1e3, 2),
        }
        if extra:
            rec.update(extra)
        print(json.dumps(rec), flush=True)
        return us

    # ---- lane half -------------------------------------------------------
    time_stage("gray", ["frame"], lambda xs, e: oi.bgr_to_gray_u8(u8_eps(xs["frame"], e)), 400)
    time_stage("blur5", ["gray"], lambda xs, e: oi.gaussian_blur5_u8(u8_eps(xs["gray"], e)), 400)
    time_stage("median", ["blurred"], lambda xs, e: oi.median_u8(u8_eps(xs["blurred"], e)), 200)

    def canny_lane(xs, e):
        return oi.canny(u8_eps(xs["blurred"], e), xs["low"], xs["high"])

    time_stage("canny_lane", ["blurred", "low", "high"], canny_lane, 100)

    def compact_lane(xs, e):
        masked = xs["masked"] ^ (e.astype(jnp.int32) > 0)  # runtime no-op
        return oh.compact_edges(
            masked & roi, lc.lane_edge_capacity,
            row_range=(int(h * lc.roi_top_y_frac), h),
        )

    time_stage("compact_lane", ["masked"], compact_lane, 100,
               extra={"capacity": lc.lane_edge_capacity})

    def hough_lane(xs, e):
        masked = xs["masked"] ^ (e.astype(jnp.int32) > 0)
        return oh.hough_segments(
            masked,
            vote_threshold=lc.hough_threshold,
            min_line_length=lc.hough_min_line_length,
            num_thetas=lc.num_thetas,
            max_lines=lc.max_lines,
            edge_capacity=lc.lane_edge_capacity,
            row_range=(int(h * lc.roi_top_y_frac), h),
        )

    time_stage("hough_lane_total", ["masked"], hough_lane, 60,
               extra={"capacity": lc.lane_edge_capacity, "note": "incl. compaction"})

    def fit(xs, e):
        segs = xs["segments"] + e
        return _separate_and_fit(segs, xs["seg_valid"], w, h,
                                 min_abs_slope=lc.min_abs_slope)

    time_stage("separate_fit", ["segments", "seg_valid"], fit, 200)

    # ---- scene half ------------------------------------------------------
    time_stage("down2", ["gray"], lambda xs, e: oi.downsample2_u8(u8_eps(xs["gray"], e)), 400)

    def canny_scene_half(xs, e):
        return oi.canny(u8_eps(xs["gray_s"], e), jnp.float32(50.0), jnp.float32(150.0))

    time_stage("canny_scene_half", ["gray_s"], canny_scene_half, 100)

    def canny_scene_full(xs, e):
        return oi.canny(u8_eps(xs["gray"], e), jnp.float32(50.0), jnp.float32(150.0))

    time_stage("canny_scene_full", ["gray"], canny_scene_full, 100)

    s = max(1, int(lc.scene_downsample))

    def hough_scene_reduced(xs, e):
        edges2 = xs["edges_scene"] ^ (e.astype(jnp.int32) > 0)
        return oh.hough_segments(
            edges2,
            vote_threshold=max(1, 100 // s),
            min_line_length=100.0 / s,
            num_thetas=lc.num_thetas,
            max_lines=lc.scene_max_lines,
            edge_capacity=max(256, lc.scene_edge_capacity // (s * s)),
            refine=lc.scene_refine,
        )

    time_stage("hough_scene_reduced", ["edges_scene"], hough_scene_reduced, 60,
               extra={"capacity": max(256, lc.scene_edge_capacity // (s * s)),
                      "refine": lc.scene_refine})

    def hough_scene_full(xs, e):
        edges2 = xs["edges_scene_full"] ^ (e.astype(jnp.int32) > 0)
        return oh.hough_segments(
            edges2,
            vote_threshold=100,
            min_line_length=100.0,
            num_thetas=lc.num_thetas,
            max_lines=lc.scene_max_lines,
            edge_capacity=lc.scene_edge_capacity,
            refine=True,
        )

    time_stage("hough_scene_full", ["edges_scene_full"], hough_scene_full, 30,
               extra={"capacity": lc.scene_edge_capacity, "refine": True})

    def scalars(xs, e):
        frame = u8_eps(xs["frame"], e)
        gray = u8_eps(xs["gray"], e)
        return (
            oi.bgr_to_hsv_green_ratio(frame),
            jnp.mean(gray.astype(jnp.float32)),
            oi.laplacian_variance(gray),
        )

    time_stage("scene_scalars", ["frame", "gray"], scalars, 200)

    # ---- fused wholes (cross-checks) --------------------------------------
    from multimodal_autonomous_driving_perception_and_planning_tpu.perception.lanes import (
        make_lane_step,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.types import (
        LaneState,
    )

    lane_step = make_lane_step(cfg)

    def lane_whole(xs, e):
        state = LaneState(
            left_fit=jnp.zeros(3) + e,
            right_fit=jnp.zeros(3),
            left_valid=jnp.bool_(False),
            right_valid=jnp.bool_(False),
        )
        _, obs, feats = lane_step(state, u8_eps(xs["frame"], e))
        return obs, feats

    time_stage("lane_step_whole", ["frame"], lane_whole, 20,
               extra={"note": "full image stack, lane + scene features"})

    # Full frames-mode pipeline (same as suite bench_frames, lower reps).
    inputs = suite._pipeline_inputs(F)
    inputs["frame"] = frames
    f = suite._scan_bench_fn(
        cfg.replace(use_frames=True, enable_tagging=True,
                    emit_candidates=False, emit_trajectories=False),
        3,
    )
    best, p50 = suite._time_digest(f, inputs, repeats=args.repeats)
    net = max(best - floor, 1e-9)
    print(json.dumps({
        "stage": "frames_pipeline_e2e",
        "us_per_frame": round(net / (F * 3) * 1e6, 2),
        "us_per_frame_incl_floor": round(best / (F * 3) * 1e6, 2),
        "reps": 3,
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
