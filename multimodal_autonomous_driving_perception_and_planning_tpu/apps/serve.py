"""Production inference server over the AOT-exported pipeline.

The reference's only "deployment" is running a Python script per video
(demo.py:201-231).  This is the serving tier a TPU deployment actually
wants: the fused scan runner is pinned as a `jax.export` StableHLO
artifact at startup (utils/export.py), and a zero-dependency HTTP server
(stdlib, like apps/webview.py) feeds it fixed-size chunks.  Sessions
carry the scan state across requests — a client streaming a long drive
in chunks gets bit-identical results to one monolithic scan (the same
exactness contract as runtime/stream.py and checkpoint/resume).

Wire format: request/response bodies are ``npz`` (numpy savez) — the
natural container for the pipeline's fixed-shape tables.

Endpoints:
  GET  /healthz           liveness + device + chunk size
  GET  /info              config summary + artifact byte size
  POST /session           create a session -> {"session": id}
  POST /infer?session=id  npz with bbox/class_id/confidence/valid/
                          ego_measurement (+frame if cfg.use_frames),
                          each with leading time axis == chunk size;
                          returns npz of per-frame outputs
  POST /reset?session=id  reset the session's scan state
  GET  /session_state?session=id  export the session carry as npz
                          (client-driven durability: sessions are
                          otherwise process-memory only)
  POST /session_state     import an exported carry -> new session id
                          (server-restart / cross-server recovery)
  GET  /metrics           request counters + inference latency
                          percentiles + uptime (JSON)
  DELETE /session?session=id  drop a session (frees its device state)

Each session pins a full PipelineState on device, so the session table
is bounded: at ``max_sessions`` the least-recently-used session is
evicted (a later request against it gets 404 and should re-create).
The server binds 127.0.0.1 by default — pass ``--host 0.0.0.0`` only
behind an authenticating proxy; /session is unauthenticated.

Micro-batching (``--batch B``): with B > 1 the artifact is the runner
``jax.vmap``-ed over a leading session axis, and concurrent ``/infer``
requests against *different* sessions coalesce into ONE device dispatch
(up to B lanes, short collection window).  One chunk's device program is
~chunk x 33 us; B sessions in one program amortize the per-dispatch issue
latency and fill the chip the way a single stream cannot — the serving
analog of the multi-camera vmap axis (parallel/mesh.py).  Lanes are
data-parallel: discrete outputs (track ids/lifecycle, tags) are
bit-identical to the unbatched server, floats sit ~1e-9 off (vmap changes
XLA fusion order) — far inside the 1e-4 parity budget (asserted in
tests/test_serve.py).  Unused lanes are padded with lane 0 and discarded.
Two queued chunks for the SAME session never share a dispatch — they
chain in arrival order.

Scale-out (``--dp D``, requires ``--batch`` divisible by D): the lane
axis of the batched artifact is mesh-sharded over the first D local
devices (utils/export.py ``lane_sharding``), so one server drives D
chips as a single GSPMD program — collective-free data parallelism;
each chip advances B/D sessions and results cross ICI only at the host
gather.  The artifact pins the device count (a dp=4 export refuses to
run single-device), and numerics are those of the batched server
(discrete outputs bit-identical, floats inside the parity budget).
"""

from __future__ import annotations

import io
import json
import threading
from collections import OrderedDict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

# Per-frame outputs returned to clients (the full dict is large; these are
# the serving-relevant surfaces — tracks, ego state, plan, tags).
_OUTPUT_KEYS = (
    "track_id",
    "track_bbox",
    "track_class_id",
    "track_confidence",
    "confirmed_order",
    "num_confirmed",
    "plan_best",
    "plan_best_positions",
    "plan_best_velocities",
)


class _BatchRequest:
    """One queued /infer awaiting a batched dispatch."""

    __slots__ = ("sid", "inputs", "event", "lane", "outs", "error", "cancelled")

    def __init__(self, sid, inputs):
        self.sid = sid
        self.inputs = inputs
        self.event = threading.Event()
        self.lane = None
        self.outs = None
        self.error: Optional[Exception] = None
        self.cancelled = False  # waiter timed out; must not advance its session


class _MicroBatcher:
    """Coalesces concurrent /infer requests into vmapped device dispatches.

    Requests queue FIFO; the dispatcher thread waits ``window_s`` after the
    first arrival for the batch to fill, then dispatches up to ``batch``
    lanes.  At most one lane per session id per dispatch — a session's
    queued chunks chain in order (the scan-state contract).
    """

    def __init__(self, server: "PipelineServer", window_s: float = 0.005):
        self.server = server
        self.window_s = float(window_s)
        self._queue: list = []
        self._cv = threading.Condition()
        self._closed = False
        self.dispatches = 0  # device programs launched
        self.lanes_served = 0  # real (non-padding) lanes across dispatches
        self._thread = threading.Thread(
            target=self._loop, name="serve-microbatch", daemon=True
        )
        self._thread.start()

    def submit(self, req: _BatchRequest) -> None:
        with self._cv:
            if self._closed:
                raise RuntimeError("server is shutting down")
            self._queue.append(req)
            self._cv.notify()

    def close(self) -> None:
        with self._cv:
            self._closed = True
            self._cv.notify()

    def cancel(self, req: _BatchRequest) -> None:
        """Drop a timed-out request: still queued -> removed (its session is
        never advanced); already taken into an in-flight dispatch -> the
        cancelled flag makes _dispatch_lanes skip the state write-back, so
        the client's retry of the same chunk is not applied twice."""
        with self._cv:
            req.cancelled = True
            self._queue = [r for r in self._queue if r is not req]

    def record_dispatch(self, lanes: int) -> None:
        """One device program launched, serving ``lanes`` real lanes."""
        with self._cv:
            self.dispatches += 1
            self.lanes_served += lanes

    def stats(self) -> Dict[str, int]:
        with self._cv:
            return {"dispatches": self.dispatches, "lanes_served": self.lanes_served}

    def _take_batch(self) -> list:
        """Pop up to ``batch`` requests, one per distinct session (FIFO)."""
        taken, seen = [], set()
        remaining = []
        for req in self._queue:
            if req.cancelled:
                continue
            if len(taken) < self.server.batch and req.sid not in seen:
                taken.append(req)
                seen.add(req.sid)
            else:
                remaining.append(req)
        self._queue = remaining
        return taken

    def _loop(self) -> None:
        import time as _time

        while True:
            with self._cv:
                while not self._queue and not self._closed:
                    self._cv.wait()
                if self._closed and not self._queue:
                    return
                # Short fill window: batch up whatever arrives while the
                # previous dispatch would still be in flight anyway.
                deadline = _time.time() + self.window_s
                while (
                    len({r.sid for r in self._queue}) < self.server.batch
                    and not self._closed
                ):
                    left = deadline - _time.time()
                    if left <= 0:
                        break
                    self._cv.wait(timeout=left)
                batch = self._take_batch()
            if batch:
                # Counters are updated by _dispatch_lanes (under the server
                # lock, BEFORE waiters wake) so /metrics read right after an
                # /infer returns reflects that request's dispatch.
                self.server._dispatch_lanes(batch)


class PipelineServer:
    """Owns the exported runner, sessions, and the device lock."""

    def __init__(
        self,
        cfg=None,
        chunk: int = 64,
        artifact: Optional[bytes] = None,
        max_sessions: int = 64,
        batch: int = 1,
        batch_window_ms: float = 5.0,
        dp: int = 1,
    ):
        import jax

        from .. import DEFAULT_CONFIG
        from ..pipeline import initial_state
        from ..utils.export import (
            deserialize_runner,
            example_sequence_inputs,
            export_sequence_runner,
        )

        if cfg is None:
            # Serving ships only _OUTPUT_KEYS; the candidate/trajectory
            # tensors (~60 KB/frame) would be stacked and then discarded.
            cfg = DEFAULT_CONFIG.replace(
                emit_candidates=False, emit_trajectories=False
            )
        self.cfg = cfg
        self.chunk = int(chunk)
        self.batch = int(batch)
        if self.batch < 1:
            raise ValueError(f"batch must be >= 1, got {batch}")
        # Scale-out: shard the micro-batch lane axis over dp devices (one
        # GSPMD program, collective-free data parallelism — each device
        # advances batch/dp sessions; utils/export.py lane_sharding).
        self.dp = int(dp)
        if self.dp < 1:
            raise ValueError(f"dp must be >= 1, got {dp}")
        if self.dp > 1 and self.batch % self.dp != 0:
            raise ValueError(f"batch={batch} must be a multiple of dp={dp}")
        if artifact is None:
            platform = jax.default_backend()
            artifact = export_sequence_runner(
                self.cfg,
                self.chunk,
                platforms=(platform,),
                batch=self.batch,
                dp=self.dp,
            )
        self.artifact_bytes = len(artifact)
        self.run = deserialize_runner(
            artifact, self.cfg, self.chunk, batch=self.batch, dp=self.dp
        )
        self._initial_state = lambda: initial_state(self.cfg)
        # Keep only shape/dtype SPECS for per-request validation: the real
        # zero-filled example arrays (a (chunk, H, W, 3) frame stack alone
        # is ~236 MB at chunk=64) are materialized once for warmup below
        # and then freed.  Requests are per-session chunks, so the specs
        # stay UNBATCHED even on a batched server (lanes stack at dispatch).
        example = example_sequence_inputs(self.cfg, self.chunk)
        self._example = {
            k: jax.ShapeDtypeStruct(v.shape, v.dtype) for k, v in example.items()
        }
        self.sessions: "OrderedDict[str, Any]" = OrderedDict()  # LRU order
        self.max_sessions = int(max_sessions)
        self._next_id = 0
        self._lock = threading.Lock()  # one device program at a time
        self.device = jax.devices()[0].platform
        # Warm the program before the socket binds: the first execution of
        # a deserialized artifact pays the server-side program load
        # (35-75 s measured on the tunnel runtime, ANALYSIS.md section 5);
        # paying it here makes first-request latency ~= steady state.
        import time as _time

        t0 = _time.time()
        if self.batch > 1:
            tile = lambda a: jax.numpy.broadcast_to(  # noqa: E731
                a, (self.batch,) + tuple(a.shape)
            )
            wstate = jax.tree_util.tree_map(tile, self._initial_state())
            wexample = {k: tile(v) for k, v in example.items()}
            _, outs = self.run(wstate, wexample)
            del wstate, wexample
        else:
            _, outs = self.run(self._initial_state(), example)
        jax.block_until_ready(outs["plan_best"])
        del example, outs  # free the warmup buffers before serving
        self.warmup_seconds = _time.time() - t0
        self.batcher: Optional[_MicroBatcher] = (
            _MicroBatcher(self, window_s=batch_window_ms / 1e3)
            if self.batch > 1
            else None
        )
        # Serving observability: counters + a bounded latency ring (the
        # pipeline-side analog is utils/metrics.py JSONL).
        self.started_at = _time.time()
        self.request_counts: Dict[str, int] = {}
        self._infer_seconds: list = []  # last <=1024 inference wall times

    def close(self) -> None:
        if self.batcher is not None:
            self.batcher.close()

    # -- session management -------------------------------------------------
    def create_session(self) -> str:
        with self._lock:
            while len(self.sessions) >= self.max_sessions:
                self.sessions.popitem(last=False)  # evict least-recently-used
            sid = f"s{self._next_id}"
            self._next_id += 1
            self.sessions[sid] = self._initial_state()
        return sid

    def reset_session(self, sid: str) -> None:
        with self._lock:
            if sid not in self.sessions:
                raise KeyError(sid)
            self.sessions[sid] = self._initial_state()
            self.sessions.move_to_end(sid)

    def delete_session(self, sid: str) -> None:
        with self._lock:
            if sid not in self.sessions:
                raise KeyError(sid)
            del self.sessions[sid]

    def count_request(self, route: str) -> None:
        with self._lock:
            self.request_counts[route] = self.request_counts.get(route, 0) + 1

    def metrics(self) -> Dict:
        import time as _time

        with self._lock:
            lat = sorted(self._infer_seconds)
            counts = dict(self.request_counts)
            n_sessions = len(self.sessions)

        def pct(p: float):
            if not lat:
                return None
            return round(lat[min(len(lat) - 1, int(p * len(lat)))] * 1e3, 3)

        out = {
            "uptime_seconds": round(_time.time() - self.started_at, 1),
            "warmup_seconds": round(self.warmup_seconds, 2),
            "sessions": n_sessions,
            "requests": counts,
            "infer_latency_ms": {"count": len(lat), "p50": pct(0.5), "p99": pct(0.99)},
            "frames_per_chunk": self.chunk,
        }
        if self.batcher is not None:
            out["batching"] = {
                "batch": self.batch,
                "dp": self.dp,
                **self.batcher.stats(),
            }
        return out

    def export_session(self, sid: str) -> Dict[str, np.ndarray]:
        """The session carry as named arrays (npz-able): client-driven
        durability — sessions otherwise live only in process memory and die
        with the server or at LRU eviction."""
        import jax

        with self._lock:
            if sid not in self.sessions:
                raise KeyError(sid)
            state = self.sessions[sid]
            self.sessions.move_to_end(sid)
            leaves = jax.tree_util.tree_leaves(state)
        host = jax.device_get(leaves)  # one transfer for the whole carry
        return {f"leaf{i}": np.asarray(l) for i, l in enumerate(host)}

    def import_session(self, arrays: Dict[str, np.ndarray]) -> str:
        """Restore an exported carry into a NEW session (same config/chunk
        server, or a different server instance — server restart recovery)."""
        import jax
        import jax.numpy as jnp

        template = self._initial_state()
        t_leaves, treedef = jax.tree_util.tree_flatten(template)
        if sorted(arrays) != sorted(f"leaf{i}" for i in range(len(t_leaves))):
            raise ValueError(
                f"expected {len(t_leaves)} state leaves named leaf0..leaf"
                f"{len(t_leaves) - 1}; got {sorted(arrays)[:5]}..."
            )
        leaves = []
        for i, t in enumerate(t_leaves):
            a = np.asarray(arrays[f"leaf{i}"])
            if tuple(a.shape) != tuple(t.shape):
                raise ValueError(
                    f"leaf{i}: expected shape {tuple(t.shape)}, got {a.shape}"
                )
            leaves.append(jnp.asarray(a.astype(t.dtype)))
        state = jax.tree_util.tree_unflatten(treedef, leaves)
        with self._lock:
            while len(self.sessions) >= self.max_sessions:
                self.sessions.popitem(last=False)
            sid = f"s{self._next_id}"
            self._next_id += 1
            self.sessions[sid] = state
        return sid

    # -- inference ----------------------------------------------------------
    def _validate_inputs(self, arrays: Dict[str, np.ndarray]) -> Dict[str, Any]:
        import jax.numpy as jnp

        expected = self._example
        missing = [k for k in expected if k not in arrays]
        if missing:
            raise ValueError(f"missing inputs: {missing}")
        inputs = {}
        for k, spec in expected.items():
            a = np.asarray(arrays[k])
            if tuple(a.shape) != tuple(spec.shape):
                raise ValueError(
                    f"input {k!r}: expected shape {tuple(spec.shape)}, got {a.shape}"
                )
            inputs[k] = jnp.asarray(a.astype(spec.dtype))
        return inputs

    def _collect_result(self, outs, lane: Optional[int] = None) -> Dict[str, np.ndarray]:
        """Pull one request's outputs to host (``lane`` indexes a batched
        dispatch's leading session axis; None means unbatched).

        ONE ``jax.device_get`` for the whole dict: per-key gets are one
        device->host round trip each (~20 keys), and on the tunnel-attached
        runtime every round trip costs milliseconds — batching them is a
        direct first-byte-latency win for /infer."""
        import jax

        def take(a):
            return a if lane is None else a[lane]

        device = {k: take(outs[k]) for k in _OUTPUT_KEYS}
        vs = outs["vehicle_state"]
        for f in ("x", "y", "speed", "heading", "acceleration", "yaw_rate"):
            device[f"vehicle_{f}"] = take(getattr(vs, f))
        for k, v in (outs.get("tags") or {}).items():
            device[f"tag_{k}"] = take(v)
        host = jax.device_get(device)
        return {k: np.asarray(v) for k, v in host.items()}

    def _record_latency(self, seconds: float) -> None:
        with self._lock:
            self._infer_seconds.append(seconds)
            if len(self._infer_seconds) > 1024:
                del self._infer_seconds[: -1024]

    def _dispatch_lanes(self, requests: list) -> None:
        """Run one batched device program over the queued requests (each a
        distinct session).  Lanes beyond len(requests) repeat lane 0; their
        outputs are discarded.  Called from the _MicroBatcher thread."""
        import jax
        import jax.numpy as jnp

        with self._lock:
            live = []
            for req in requests:
                state = self.sessions.get(req.sid)
                if state is None:
                    req.error = KeyError(req.sid)
                    req.event.set()
                else:
                    live.append((req, state))
            if not live:
                return
            try:
                pad = self.batch - len(live)
                lane_states = [s for _, s in live] + [live[0][1]] * pad
                stacked_state = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs), *lane_states
                )
                lane_inputs = [r.inputs for r, _ in live] + [live[0][0].inputs] * pad
                stacked_inputs = {
                    k: jnp.stack([li[k] for li in lane_inputs])
                    for k in lane_inputs[0]
                }
                new_state, outs = self.run(stacked_state, stacked_inputs)
                for i, (req, _) in enumerate(live):
                    if req.cancelled:  # waiter timed out mid-flight: the
                        continue  # session must not silently advance
                    self.sessions[req.sid] = jax.tree_util.tree_map(
                        lambda a, i=i: a[i], new_state
                    )
                    self.sessions.move_to_end(req.sid)
                    req.lane, req.outs = i, outs
                self.batcher.record_dispatch(
                    sum(1 for r, _ in live if not r.cancelled)
                )
            except Exception as e:  # noqa: BLE001 — surface to every waiter
                for req, _ in live:
                    req.error = e
        for req, _ in live:
            req.event.set()

    def infer(self, sid: str, arrays: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        import time as _time

        inputs = self._validate_inputs(arrays)
        t0 = _time.time()

        if self.batcher is not None:
            req = _BatchRequest(sid, inputs)
            self.batcher.submit(req)
            if not req.event.wait(timeout=600):
                self.batcher.cancel(req)
                raise TimeoutError("batched dispatch did not complete in 600s")
            if req.error is not None:
                raise req.error
            self._record_latency(_time.time() - t0)
            return self._collect_result(req.outs, lane=req.lane)

        with self._lock:
            if sid not in self.sessions:
                raise KeyError(sid)
            state = self.sessions[sid]
            new_state, outs = self.run(state, inputs)
            self.sessions[sid] = new_state
            self.sessions.move_to_end(sid)
        self._record_latency(_time.time() - t0)
        return self._collect_result(outs)


def _npz_bytes(arrays: Dict[str, np.ndarray]) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


def _npz_load(data: bytes) -> Dict[str, np.ndarray]:
    with np.load(io.BytesIO(data), allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


def make_handler(server: PipelineServer):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code: int, obj) -> None:
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            path = urlparse(self.path).path
            server.count_request(f"GET {path}")
            if path == "/metrics":
                self._json(200, server.metrics())
            elif path == "/healthz":
                self._json(
                    200,
                    {
                        "status": "ok",
                        "device": server.device,
                        "frames_per_chunk": server.chunk,
                        "batch": server.batch,
                        "dp": server.dp,
                    },
                )
            elif path == "/info":
                cfg = server.cfg
                self._json(
                    200,
                    {
                        "use_frames": cfg.use_frames,
                        "enable_tagging": cfg.enable_tagging,
                        "max_detections": cfg.detector.max_detections,
                        "max_tracks": cfg.tracker.max_tracks,
                        "frame_size": [cfg.frame_width, cfg.frame_height],
                        "artifact_bytes": server.artifact_bytes,
                        "sessions": len(server.sessions),
                        "max_sessions": server.max_sessions,
                    },
                )
            elif path == "/session_state":
                q = parse_qs(urlparse(self.path).query)
                try:
                    out = server.export_session(q["session"][0])
                    self._send(200, _npz_bytes(out), "application/octet-stream")
                except KeyError as e:
                    self._json(404, {"error": f"unknown session {e}"})
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            url = urlparse(self.path)
            server.count_request(f"POST {url.path}")
            q = parse_qs(url.query)
            n = int(self.headers.get("Content-Length") or 0)
            body = self.rfile.read(n) if n else b""
            try:
                if url.path == "/session":
                    self._json(200, {"session": server.create_session()})
                elif url.path == "/reset":
                    server.reset_session(q["session"][0])
                    self._json(200, {"status": "reset"})
                elif url.path == "/infer":
                    out = server.infer(q["session"][0], _npz_load(body))
                    self._send(200, _npz_bytes(out), "application/octet-stream")
                elif url.path == "/session_state":
                    # Import an exported carry into a new session.
                    sid = server.import_session(_npz_load(body))
                    self._json(200, {"session": sid})
                else:
                    self._json(404, {"error": "not found"})
            except KeyError as e:
                self._json(404, {"error": f"unknown session {e}"})
            except Exception as e:  # noqa: BLE001 — surface to client
                self._json(400, {"error": str(e)})

        def do_DELETE(self):
            url = urlparse(self.path)
            server.count_request(f"DELETE {url.path}")
            q = parse_qs(url.query)
            try:
                if url.path == "/session":
                    server.delete_session(q["session"][0])
                    self._json(200, {"status": "deleted"})
                else:
                    self._json(404, {"error": "not found"})
            except KeyError as e:
                self._json(404, {"error": f"unknown session {e}"})

    return Handler


def serve(
    cfg=None,
    chunk: int = 64,
    port: int = 8701,
    block: bool = True,
    artifact: Optional[bytes] = None,
    host: str = "127.0.0.1",
    max_sessions: int = 64,
    batch: int = 1,
    batch_window_ms: float = 5.0,
    dp: int = 1,
):
    """Start the inference server; returns the HTTPServer when non-blocking."""
    ps = PipelineServer(
        cfg=cfg,
        chunk=chunk,
        artifact=artifact,
        max_sessions=max_sessions,
        batch=batch,
        batch_window_ms=batch_window_ms,
        dp=dp,
    )
    httpd = ThreadingHTTPServer((host, port), make_handler(ps))
    httpd.pipeline_server = ps
    batched = f", {batch}-session micro-batching" if batch > 1 else ""
    if dp > 1:
        batched += f", lane axis sharded over {dp} devices"
    print(
        f"Serving AOT pipeline artifact ({ps.artifact_bytes} bytes, "
        f"{chunk}-frame chunks{batched}) on :{port} "
        f"(warmup {ps.warmup_seconds:.1f}s)"
    )
    if block:
        httpd.serve_forever()
    else:
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
    return httpd


def main(argv=None):
    import argparse

    # CLI contract: JAX_PLATFORMS=cpu must win over sitecustomize's config
    # override (utils/platform.py) — without this, `python -m ...apps.serve`
    # dials the TPU tunnel even when the env var says cpu, and hangs in
    # PJRT init if the tunnel is down.  app.py applies it too, but this
    # module is a documented direct entry point.
    from ..utils.platform import apply_platform_env

    apply_platform_env()

    parser = argparse.ArgumentParser(description="AOT pipeline inference server")
    parser.add_argument("--port", type=int, default=8701)
    parser.add_argument("--chunk", type=int, default=64)
    parser.add_argument("--no-tagging", action="store_true")
    parser.add_argument(
        "--host",
        default="127.0.0.1",
        help="bind address; 0.0.0.0 only behind an authenticating proxy",
    )
    parser.add_argument("--max-sessions", type=int, default=64)
    parser.add_argument(
        "--batch",
        type=int,
        default=1,
        help="micro-batch size: coalesce concurrent /infer requests from "
        "up to B sessions into one vmapped device dispatch",
    )
    parser.add_argument(
        "--batch-window-ms",
        type=float,
        default=5.0,
        help="how long a dispatch waits for more sessions to coalesce",
    )
    parser.add_argument(
        "--dp",
        type=int,
        default=1,
        help="shard the micro-batch lane axis over this many devices "
        "(GSPMD data parallelism; requires --batch divisible by --dp)",
    )
    args = parser.parse_args(argv)

    # Same persistent compile cache as bench/demo: the export's
    # trace+compile at startup loads from cache on all but the first-ever
    # launch (threshold rationale in apps/demo.py).
    from .demo import _enable_persistent_compile_cache

    _enable_persistent_compile_cache()

    from .. import DEFAULT_CONFIG

    cfg = DEFAULT_CONFIG.replace(
        use_frames=False,
        enable_tagging=not args.no_tagging,
        emit_candidates=False,
        emit_trajectories=False,
    )
    serve(
        cfg=cfg,
        chunk=args.chunk,
        port=args.port,
        host=args.host,
        max_sessions=args.max_sessions,
        batch=args.batch,
        batch_window_ms=args.batch_window_ms,
        dp=args.dp,
    )


if __name__ == "__main__":
    main()
