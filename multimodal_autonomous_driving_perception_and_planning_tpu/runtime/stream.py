"""Streaming pipeline driver: native decode overlapped with device compute.

The reference's hot loop is strictly serial — decode a frame, then run every
stage on it (demo.py:97-177, with a per-frame container seek in
data/loaders/video_loader.py:108-131).  Here the native ring
(`frame_ring.cpp`) produces frames on a C++ thread while the device executes
the previous chunk's fused scan: JAX dispatch is asynchronous, so the host
returns from the runner call immediately, drains the next chunk from the
ring during device execution, and only blocks when it needs the results.

    source = NativeFrameSource(...)          # C++ producer thread
    outs   = run_stream(cfg, source, total)  # overlapped chunks

State chains across chunks (same exactness contract as checkpoint/resume),
so the chunked stream is bit-identical to one monolithic scan.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PipelineConfig
from ..pipeline import initial_state, make_sequence_runner


def _chunk_inputs(
    cfg: PipelineConfig, frames: np.ndarray, start: int, dt: float, ego=None
):
    """Inputs for frames [start, start+len): detections keyed off the
    reference's post-increment frame counter; ``ego`` rows come from the
    caller's IncrementalEgoMotion (bit-identical to slicing one monolithic
    seed-0 stream) or are regenerated from frame 0 when omitted."""
    from ..data.synthetic import ego_motion_stream, simulated_detection_stream

    n = frames.shape[0]
    dets = simulated_detection_stream(
        n,
        height=cfg.frame_height,
        width=cfg.frame_width,
        capacity=cfg.detector.max_detections,
        start_frame_count=start + 1,
    )
    if ego is None:
        ego = ego_motion_stream(start + n, dt=dt, seed=0)[start:]
    inputs = {k: jnp.asarray(v) for k, v in dets.items()}
    inputs["ego_measurement"] = jnp.asarray(ego, jnp.float32)
    if cfg.use_frames:
        inputs["frame"] = jnp.asarray(np.ascontiguousarray(frames))  # uint8
    return dets, inputs


def run_stream(
    cfg: PipelineConfig,
    source,
    total_frames: int,
    chunk: int = 64,
    dt: float = 1.0 / 30.0,
    collect_host: bool = True,
    runner=None,
):
    """Drive the fused pipeline from a NativeFrameSource with overlap.

    Returns (outs, stats): ``outs`` is the per-frame output dict stacked on
    the host over all chunks (None when ``collect_host`` is False; {} when
    the source yields zero frames), and ``stats`` holds
    frames / wall_s / decode_s / fps (decode_s is the host time blocked in
    the ring drain — time NOT overlapped with device execution).

    A producer stall surfaces as TimeoutError from the source (see
    NativeFrameSource.next_batch) rather than a silently truncated stream:
    a timeout-shortened mid-stream chunk would advance the carried scan
    state through padded frames and break the bit-identical contract.

    Every chunk has the same shape (the last one is padded), so exactly one
    XLA program is compiled and reused.  Pass a prebuilt ``runner`` (from
    `make_sequence_runner(cfg, donate=False)`) to amortize the jit build
    across calls — long-running consumers should always do this.
    """
    from ..data.synthetic import IncrementalEgoMotion

    if runner is None:
        runner = make_sequence_runner(cfg, donate=False)
    state = initial_state(cfg)
    ego_src = IncrementalEgoMotion(dt=dt, seed=0)

    t_wall0 = time.perf_counter()
    decode_s = 0.0
    pending = None  # (dispatched outs, n_valid)
    results = []

    start = 0
    while start < total_frames:
        n = min(chunk, total_frames - start)
        t0 = time.perf_counter()
        frames = source.next_batch(n)
        decode_s += time.perf_counter() - t0
        if frames.shape[0] == 0:
            break
        n = frames.shape[0]
        if n < chunk:  # pad to the compiled shape; drop the tail later
            # Safe only because a short batch means EXHAUSTION (timeouts
            # raise in the source): this is the final chunk, so the state
            # advanced through padded frames is never consumed.
            pad = np.repeat(frames[-1:], chunk - n, axis=0)
            frames = np.concatenate([frames, pad], axis=0)
        _, inputs = _chunk_inputs(
            cfg, frames, start, dt, ego=ego_src.take(frames.shape[0])
        )

        # Dispatch is async: this returns before the device finishes, so the
        # next ring drain above runs concurrently with device execution.
        state, outs = runner(state, inputs)

        if pending is not None and collect_host:
            prev_outs, prev_n = pending
            results.append(
                jax.tree_util.tree_map(
                    lambda x: np.asarray(x)[:prev_n], prev_outs
                )
            )
        pending = (outs, n)
        start += n

    if pending is not None and collect_host:
        prev_outs, prev_n = pending
        results.append(
            jax.tree_util.tree_map(lambda x: np.asarray(x)[:prev_n], prev_outs)
        )
    elif pending is not None:
        # A host readback, not block_until_ready: on tunnel-attached
        # runtimes block_until_ready can resolve before the dispatched
        # chain finishes, while np.asarray must return correct bytes and
        # therefore really waits (benchmarks/suite.py methodology).
        np.asarray(jax.tree_util.tree_leaves(pending[0])[0])

    wall = time.perf_counter() - t_wall0
    stats = {
        "frames": start,
        "wall_s": wall,
        "decode_s": decode_s,
        "fps": start / wall if wall > 0 else 0.0,
    }
    if not collect_host:
        return None, stats
    if not results:  # zero frames produced (empty source / total_frames=0)
        return {}, stats
    merged: Dict[str, Any] = jax.tree_util.tree_map(
        lambda *xs: np.concatenate(xs, axis=0), *results
    )
    return merged, stats
