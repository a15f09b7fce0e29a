#!/usr/bin/env python
"""HTTP load generator for the AOT inference server (apps/serve.py).

Drives N concurrent client sessions, each streaming C chunks, against a
running server and reports aggregate frames/s plus request-latency
percentiles and the server's own /metrics snapshot (one JSON line) — the
end-to-end measurement of session micro-batching (--batch) that the
device-level suite metric (benchmarks/suite.py serve_microbatch_fps)
cannot capture: this path includes HTTP, npz encode/decode, host<->device
transfer, and the coalescing window.

Deliberately dependency-free (stdlib + numpy, no jax, no package import):
it self-configures from the server's /healthz and /info endpoints, so it
can run from any machine that can reach the server — including a
laptop pointed at a TPU host.  Input chunks are synthetic detection
tables with plausible dynamics (load is load; reference-RNG parity is
the test suite's job, not the load generator's).

Usage:
  python app.py --backend serve --port 8701 --batch 8 &   # server
  python tools/serve_loadgen.py --url http://127.0.0.1:8701 \
      --sessions 8 --chunks 4
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import threading
import time
import urllib.request

import numpy as np


def _get(url: str, timeout: float = 30.0):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return json.loads(r.read())


def _post(url: str, data: bytes = b"", timeout: float = 600.0) -> bytes:
    req = urllib.request.Request(url, data=data, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.read()


def make_chunk(
    rng: np.random.Generator,
    num_frames: int,
    capacity: int,
    width: int,
    height: int,
) -> bytes:
    """npz chunk: a few persistent boxes drifting across frames + ego."""
    n_obj = int(rng.integers(2, max(3, capacity // 2)))
    cx = rng.uniform(0.15 * width, 0.85 * width, n_obj)
    cy = rng.uniform(0.3 * height, 0.9 * height, n_obj)
    vx = rng.uniform(-2.0, 2.0, n_obj)
    w = rng.uniform(0.04 * width, 0.12 * width, n_obj)
    h = rng.uniform(0.06 * height, 0.18 * height, n_obj)

    bbox = np.zeros((num_frames, capacity, 4), np.float32)
    class_id = np.zeros((num_frames, capacity), np.int32)
    confidence = np.zeros((num_frames, capacity), np.float32)
    valid = np.zeros((num_frames, capacity), bool)
    for t in range(num_frames):
        x = np.clip(cx + vx * t, 0, width - 1)
        bbox[t, :n_obj, 0] = np.clip(x - w / 2, 0, width - 1)
        bbox[t, :n_obj, 1] = np.clip(cy - h / 2, 0, height - 1)
        bbox[t, :n_obj, 2] = np.clip(x + w / 2, 0, width - 1)
        bbox[t, :n_obj, 3] = np.clip(cy + h / 2, 0, height - 1)
        class_id[t, :n_obj] = rng.integers(0, 8, n_obj)
        confidence[t, :n_obj] = rng.uniform(0.5, 0.99, n_obj)
        valid[t, :n_obj] = True

    ego = np.zeros((num_frames, 4), np.float32)
    ego[:, 0] = 1.0 / 30.0  # dt
    ego[:, 2] = 12.0 + rng.uniform(-1, 1)  # speed
    buf = io.BytesIO()
    np.savez(
        buf,
        bbox=bbox,
        class_id=class_id,
        confidence=confidence,
        valid=valid,
        ego_measurement=ego,
    )
    return buf.getvalue()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--url", default="http://127.0.0.1:8701")
    ap.add_argument("--sessions", type=int, default=8)
    ap.add_argument("--chunks", type=int, default=4, help="chunks per session")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--timeout", type=float, default=600.0)
    ap.add_argument(
        "--warmup", type=int, default=1,
        help="untimed chunks driven through a throwaway session first, so "
        "the server-side program load (~35-75 s on the tunnel runtime, "
        "ANALYSIS §5) lands outside the measured window; 0 disables",
    )
    args = ap.parse_args(argv)

    health = _get(f"{args.url}/healthz")
    info = _get(f"{args.url}/info")
    chunk_frames = int(health["frames_per_chunk"])
    if info.get("use_frames"):
        print(
            json.dumps({"error": "loadgen supports detections-mode servers only"}),
            file=sys.stderr,
        )
        return 2
    capacity = int(info["max_detections"])
    width, height = info["frame_size"]

    # All fixtures built up front on ONE thread (payload generation must
    # not count against serving throughput, and must not interleave with
    # request timing).
    rng = np.random.default_rng(args.seed)
    payloads = [
        [
            make_chunk(rng, chunk_frames, capacity, width, height)
            for _ in range(args.chunks)
        ]
        for _ in range(args.sessions)
    ]
    warmup_s = 0.0
    if args.warmup > 0:
        t0 = time.perf_counter()
        wsid = json.loads(_post(f"{args.url}/session"))["session"]
        for _ in range(args.warmup):
            raw = _post(
                f"{args.url}/infer?session={wsid}",
                make_chunk(rng, chunk_frames, capacity, width, height),
                timeout=args.timeout,
            )
            np.load(io.BytesIO(raw)).close()
        req = urllib.request.Request(
            f"{args.url}/session?session={wsid}", method="DELETE"
        )
        urllib.request.urlopen(req, timeout=30).close()
        warmup_s = time.perf_counter() - t0

    sids = [
        json.loads(_post(f"{args.url}/session"))["session"]
        for _ in range(args.sessions)
    ]

    latencies: list = [[] for _ in range(args.sessions)]
    errors: list = []
    barrier = threading.Barrier(args.sessions)

    def drive(i: int) -> None:
        try:
            barrier.wait(timeout=60)
            for c in range(args.chunks):
                t0 = time.perf_counter()
                raw = _post(
                    f"{args.url}/infer?session={sids[i]}",
                    payloads[i][c],
                    timeout=args.timeout,
                )
                latencies[i].append(time.perf_counter() - t0)
                np.load(io.BytesIO(raw)).close()  # decode counts as client work
        except Exception as e:  # noqa: BLE001
            errors.append(f"session {i}: {type(e).__name__}: {e}")

    threads = [threading.Thread(target=drive, args=(i,)) for i in range(args.sessions)]
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=args.timeout)
    wall = time.perf_counter() - t_start

    for sid in sids:
        try:
            req = urllib.request.Request(
                f"{args.url}/session?session={sid}", method="DELETE"
            )
            urllib.request.urlopen(req, timeout=30).close()
        except Exception:  # noqa: BLE001 — cleanup is best-effort
            pass

    lat = sorted(t for per_session in latencies for t in per_session)
    total_frames = len(lat) * chunk_frames
    pct = lambda p: round(lat[min(len(lat) - 1, int(p * len(lat)))] * 1e3, 2)  # noqa: E731
    result = {
        "metric": "serve_http_fps",
        "value": round(total_frames / wall, 2) if wall > 0 else None,
        "unit": "frames/s",
        "sessions": args.sessions,
        "chunks_per_session": args.chunks,
        "chunk_frames": chunk_frames,
        "completed_requests": len(lat),
        "request_latency_ms": (
            {"p50": pct(0.5), "p99": pct(0.99)} if lat else None
        ),
        "errors": errors,
        "warmup_chunks": args.warmup,
        "warmup_seconds": round(warmup_s, 2),
        "server_metrics": _get(f"{args.url}/metrics"),
    }
    print(json.dumps(result))
    return 1 if errors or not lat else 0


if __name__ == "__main__":
    sys.exit(main())
