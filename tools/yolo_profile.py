#!/usr/bin/env python
"""Per-stage MFU attribution for the YOLOv8 detect path (VERDICT r4 #3).

Why is yolov8n 23% MFU when the same conv-tower code posts 38% on
yolov8m?  This tool answers with numbers: it times truncated prefixes of
the network (models/yolov8.py ``stop_after``) plus the decode/NMS tail,
each as its own program with the suite's nonce+digest methodology, and
pairs every stage with XLA cost-analysis flops and bytes so each row
carries its arithmetic intensity (flops/byte) against the chip's ridge
point (197 bf16 TFLOP/s / ~0.82 TB/s ~= 240 flops/byte on v5e: stages
far below it are HBM-bound no matter how the MXU is fed).

Usage: python tools/yolo_profile.py [--variant n] [--batch 128]
       [--img 640] [--repeats 5]
Prints one JSON line per stage.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "benchmarks"))

def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="n")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--reps", type=int, default=4, help="chained reps per call")
    args = ap.parse_args()

    from multimodal_autonomous_driving_perception_and_planning_tpu.utils.platform import (
        apply_platform_env,
    )

    apply_platform_env()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import suite

    suite._setup_cache()
    peak_tflops, kind = suite._device_peak_tflops()
    peak_tflops = peak_tflops or 197.0

    from multimodal_autonomous_driving_perception_and_planning_tpu.models.yolov8 import (
        YOLOv8,
        decode_predictions,
    )
    from multimodal_autonomous_driving_perception_and_planning_tpu.ops.nms import nms

    B, S = args.batch, args.img
    print(f"# device: {jax.devices()} variant={args.variant} batch={B}", flush=True)
    floor, floor_p50 = suite.measure_dispatch_floor(args.repeats)
    print(f"# dispatch_floor_ms: best={floor*1e3:.2f}", flush=True)

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.random((B, S, S, 3), np.float32))

    def cost(fn, *a):
        try:
            ca = jax.jit(fn).lower(*a).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            return float(ca.get("flops", np.nan)), float(
                ca.get("bytes accessed", np.nan)
            )
        except Exception:
            return float("nan"), float("nan")

    def time_fn(name, fn, variables, x, flops=None, byts=None):
        """fn: (variables, x) -> pytree; chained reps on a digest.

        ``variables`` rides as an explicit jit ARGUMENT — a closed-over
        device pytree becomes a per-call transferred constant on the
        tunnel runtime and inflates every timing (CLAUDE.md rule 1;
        suite.py's bench_yolo does the same)."""
        def bench(nonce, variables, x):
            def one_rep(carry, _):
                digest_in, _ = carry
                eps = (nonce + digest_in) * 1e-30
                out = fn(variables, x + eps)
                return (digest_in + suite._tree_digest(out), 0), None

            (digest, _), _ = jax.lax.scan(
                one_rep, (nonce, 0), None, length=args.reps
            )
            return digest

        f = jax.jit(bench)
        best, p50 = suite._time_digest(f, variables, x, repeats=args.repeats)
        net = max(best - floor, 1e-9) / args.reps
        rec = {
            "stage": name,
            "ms_per_batch": round(net * 1e3, 2),
            "us_per_frame": round(net / B * 1e6, 2),
        }
        if flops and flops == flops:
            achieved = flops / net / 1e12
            rec["gflops"] = round(flops / 1e9, 1)
            rec["achieved_tflops"] = round(achieved, 2)
            rec["mfu_pct"] = round(achieved / peak_tflops * 100, 2)
        if byts and byts == byts:
            rec["gbytes"] = round(byts / 1e9, 2)
            rec["ai_flops_per_byte"] = (
                round(flops / byts, 1) if flops and flops == flops else None
            )
            rec["achieved_gbps"] = round(byts / net / 1e9, 1)
        print(json.dumps(rec), flush=True)
        return net

    # --- cumulative prefixes -> per-stage diffs ---------------------------
    prefixes = ["b0", "b2", "b4", "b6", "b9", "neck", "full"]
    cum = {}
    for p in prefixes:
        model = YOLOv8(
            variant=args.variant,
            dtype=jnp.bfloat16,
            stop_after="" if p == "full" else p,
        )
        variables = model.init(jax.random.PRNGKey(0), frames[:1])

        def apply_fn(variables, x, model=model):
            return model.apply(variables, x)

        fl, by = cost(apply_fn, variables, frames)
        cum[p] = time_fn(f"prefix_{p}", apply_fn, variables, frames, fl, by)

    prev = 0.0
    for p in prefixes:
        print(
            json.dumps(
                {
                    "stage": f"delta_{p}",
                    "ms_per_batch": round((cum[p] - prev) * 1e3, 2),
                    "share_pct": round((cum[p] - prev) / cum["full"] * 100, 1),
                }
            ),
            flush=True,
        )
        prev = cum[p]

    # --- decode + NMS tail (the PRODUCTION path: apply_sigmoid=False and
    # one sigmoid on the per-anchor max logit, mirroring make_yolo_detector
    # — profiling the superseded sigmoid-everything decode would
    # mis-attribute tail cost) -----------------------------------------------
    model = YOLOv8(variant=args.variant, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), frames[:1])
    outputs = jax.jit(lambda v, x: model.apply(v, x))(variables, frames)
    outputs = jax.block_until_ready(outputs)

    def decode_fn(outs):
        boxes, cls = decode_predictions(outs, S, apply_sigmoid=False)
        return boxes, cls

    def tail_fn(outs):
        boxes, cls_logits = decode_predictions(outs, S, apply_sigmoid=False)
        scores = jax.nn.sigmoid(jnp.max(cls_logits, axis=-1))
        classes = jnp.argmax(cls_logits, axis=-1).astype(jnp.int32)
        return jax.vmap(
            lambda b, s, c: nms(
                b, s, c, iou_threshold=0.45, score_threshold=0.25,
                max_det=32, pre_topk=256,
            )
        )(boxes, scores, classes)

    def time_tail(name, fn):
        def bench(nonce, outs):
            def one_rep(carry, _):
                digest_in, _ = carry
                eps = ((nonce + digest_in) * 1e-30).astype(jnp.bfloat16)
                pert = [(b + eps, c + eps) for b, c in outs]
                out = fn(pert)
                return (digest_in + suite._tree_digest(out), 0), None

            (digest, _), _ = jax.lax.scan(
                one_rep, (nonce, 0), None, length=args.reps
            )
            return digest

        f = jax.jit(bench)
        best, p50 = suite._time_digest(f, outputs, repeats=args.repeats)
        net = max(best - floor, 1e-9) / args.reps
        print(
            json.dumps(
                {
                    "stage": name,
                    "ms_per_batch": round(net * 1e3, 2),
                    "us_per_frame": round(net / B * 1e6, 2),
                }
            ),
            flush=True,
        )

    time_tail("decode_dfl", decode_fn)
    time_tail("decode_plus_nms", tail_fn)
    return 0


if __name__ == "__main__":
    sys.exit(main())
