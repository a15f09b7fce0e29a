#!/usr/bin/env python
"""Multi-chip scaling tracked as numbers, not a boolean.

The dryrun (__graft_entry__.dryrun_multichip) proves the sharded paths
compile and execute; this tool records *how the work scales* with device
count on the virtual CPU mesh, so regressions in the sharded programs are
visible without a real pod.  For D in {1, 2, 4, 8} it runs:

- the 8-camera multicamera runner with the camera axis mesh-sharded over
  D devices (parallel/mesh.py — strong scaling: 8/D cameras per device);
- the dp-sharded micro-batched serving program (utils/export.py
  lane_sharding — 8 session lanes over D devices, collective-free DP).

Two measurements per row:

- ``flops_per_device``: XLA ``compiled.cost_analysis()`` flops of the
  partitioned per-device program.  DETERMINISTIC — on a correctly
  sharded data-parallel program it must scale ~1/D; a broken sharding
  (replicated compute, a stray all-gather of the batch) shows up as a
  flat flops curve long before any timing would.  Rows where the D=1 ->
  D ratio deviates from ideal by >25% are flagged ``"regression": true``
  and the tool exits nonzero.
- ``wall_ms`` best-of-N: informative only on the CPU mesh (virtual
  devices share host cores, so wall time does NOT improve with D here;
  on real hardware it is the throughput number).

Usage: python tools/mesh_scaling.py [--frames 64] [--reps 3]
       [--out benchmarks/artifacts/mesh_scaling.jsonl]
Prints one JSON line per (mode, D) and writes them to --out.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _pin_cpu_mesh(n: int = 8) -> None:
    """Must run before jax import: 8 virtual CPU devices."""
    flags = re.sub(
        r"--xla_force_host_platform_device_count=\d+",
        "",
        os.environ.get("XLA_FLAGS", ""),
    )
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n}"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    # sitecustomize force-registers the axon backend via jax.config; undo
    # it so JAX_PLATFORMS=cpu wins (same contract as every CLI surface).
    from multimodal_autonomous_driving_perception_and_planning_tpu.utils.platform import (
        apply_platform_env,
    )

    apply_platform_env()


def _flops(compiled) -> float:
    """Per-device flops from XLA cost analysis (dict or [dict] across
    JAX versions)."""
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", float("nan")))


def _time_best(fn, args, reps: int, nonce_leaf) -> float:
    """Best-of-N wall time of fn(*args) with a fresh nonce folded into one
    input leaf each rep and timing to a float() readback of an output
    digest — identical-args + block_until_ready timing can be served from
    a cache / resolve early on some runtimes (CLAUDE.md rule 2).

    ``nonce_leaf``: callable(args, nonce) -> new args with the nonce added
    to a float input leaf (zero-preserving at nonce=0 is not required —
    the perturbation is ~1e-7 on real-scale inputs, timing-neutral).
    """
    import jax
    import jax.numpy as jnp

    def digest(out):
        leaves = [
            jnp.sum(x.astype(jnp.float32))
            for x in jax.tree_util.tree_leaves(out)
            if hasattr(x, "dtype")
        ]
        return float(sum(float(v) for v in leaves[:4]))

    digest(fn(*nonce_leaf(args, 0.0)))  # warmup/compile
    best = float("inf")
    for i in range(max(1, reps)):
        a = nonce_leaf(args, 1e-7 * (i + 1))
        t0 = time.perf_counter()
        digest(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best


def collect_rows(frames: int = 64, reps: int = 3, devices=(1, 2, 4, 8)):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodal_autonomous_driving_perception_and_planning_tpu import (
        DEFAULT_CONFIG,
        initial_state,
        make_sequence_runner,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.data.synthetic import (
        ego_motion_stream,
        simulated_detection_stream,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.parallel.mesh import (
        make_camera_mesh,
        make_multicamera_runner,
        stack_states,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.utils.export import (
        example_sequence_inputs,
        lane_sharding,
    )

    assert jax.device_count() >= max(devices), (
        f"need {max(devices)} devices, have {jax.device_count()}"
    )
    cfg = DEFAULT_CONFIG.replace(use_frames=False, enable_tagging=False)
    cams = 8
    rows = []

    # --- 8-camera runner, camera axis over D devices --------------------
    dets = simulated_detection_stream(frames)
    ego = ego_motion_stream(frames, seed=0).astype(np.float32)
    rep_c = lambda x: np.broadcast_to(  # noqa: E731
        np.asarray(x), (cams,) + np.asarray(x).shape
    )
    inputs = {
        "bbox": rep_c(dets["bbox"]),
        "class_id": rep_c(dets["class_id"]),
        "confidence": rep_c(dets["confidence"]),
        "valid": rep_c(dets["valid"]),
        "ego_measurement": rep_c(ego),
    }
    def nonce_ego(a, nonce):
        s, i = a
        i = dict(i)
        i["ego_measurement"] = np.asarray(i["ego_measurement"]) + np.float32(nonce)
        return (s, i)

    for d in devices:
        mesh = make_camera_mesh(d)
        runner = make_multicamera_runner(cfg, mesh)
        states = stack_states(cfg, cams)
        wall = _time_best(runner, (states, inputs), reps, nonce_ego)
        try:
            flops = _flops(runner.lower(states, inputs).compile())
        except Exception:
            flops = float("nan")
        rows.append(
            dict(mode="multicam8", devices=d, frames=frames,
                 wall_ms=round(wall * 1e3, 2), flops_per_device=flops)
        )

    # --- dp-sharded micro-batched serving program ------------------------
    lanes = 8
    chunk = max(8, frames // 4)
    run = make_sequence_runner(cfg, donate=False)
    vrun = jax.vmap(run)
    state1 = initial_state(cfg)
    inputs1 = example_sequence_inputs(cfg, chunk)
    tile = lambda a: jnp.broadcast_to(  # noqa: E731
        jnp.asarray(a), (lanes,) + tuple(np.asarray(a).shape)
    )
    state_b = jax.tree_util.tree_map(tile, state1)
    inputs_b = {k: tile(v) for k, v in inputs1.items()}
    for d in devices:
        _, shard_for = lane_sharding(d)
        sharded = jax.jit(
            vrun,
            in_shardings=jax.tree_util.tree_map(
                lambda l: shard_for(l), (state_b, inputs_b)
            ),
        )
        wall = _time_best(sharded, (state_b, inputs_b), reps, nonce_ego)
        try:
            flops = _flops(sharded.lower(state_b, inputs_b).compile())
        except Exception:
            flops = float("nan")
        rows.append(
            dict(mode="serve_dp", devices=d, lanes=lanes, chunk=chunk,
                 wall_ms=round(wall * 1e3, 2), flops_per_device=flops)
        )

    return apply_verdicts(rows)


def apply_verdicts(rows):
    """Annotate rows in place with flops_ratio_vs_d1 + the regression flag.

    One function used by both the tool and its tests (so changing the
    threshold cannot silently strand the test on a stale copy).  Rules:
    per-device flops must land within 25% of the ideal 1/D share of the
    D=1 program; unavailable cost analysis (NaN flops) is itself a
    FAILURE — a missing measurement must never read as a clean artifact.
    """
    for mode in sorted({r["mode"] for r in rows}):
        sub = [r for r in rows if r["mode"] == mode]
        base = next(r for r in sub if r["devices"] == 1)
        base_flops = base["flops_per_device"]
        for r in sub:
            ideal = 1.0 / r["devices"]
            ratio = (
                r["flops_per_device"] / base_flops
                if base_flops == base_flops and base_flops > 0
                else float("nan")
            )
            if ratio != ratio:  # NaN: cost analysis unavailable
                r["flops_ratio_vs_d1"] = None
                r["regression"] = True
                r["error"] = "cost_analysis_unavailable"
            else:
                r["flops_ratio_vs_d1"] = round(ratio, 4)
                # >25% above the ideal 1/D per-device share = the sharding
                # is not partitioning the work (replication/gathered batch).
                r["regression"] = bool(ratio > ideal * 1.25)
    return rows


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=64)
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument(
        "--out", default=str(REPO / "benchmarks" / "artifacts" / "mesh_scaling.jsonl")
    )
    args = parser.parse_args()

    _pin_cpu_mesh(8)
    rows = collect_rows(frames=args.frames, reps=args.reps)
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with out.open("w") as f:
        for r in rows:
            line = json.dumps(r)
            print(line, flush=True)
            f.write(line + "\n")
    bad = [r for r in rows if r.get("regression")]
    if bad:
        print(f"# SCALING REGRESSION in {len(bad)} row(s)", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
