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


class PipelineServer:
    """Owns the exported runner, sessions, and the device lock."""

    def __init__(
        self,
        cfg=None,
        chunk: int = 64,
        artifact: Optional[bytes] = None,
        max_sessions: int = 64,
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
        if artifact is None:
            platform = jax.default_backend()
            artifact = export_sequence_runner(
                self.cfg, self.chunk, platforms=(platform,)
            )
        self.artifact_bytes = len(artifact)
        self.run = deserialize_runner(artifact, self.cfg, self.chunk)
        self._initial_state = lambda: initial_state(self.cfg)
        # Keep only shape/dtype SPECS for per-request validation: the real
        # zero-filled example arrays (a (chunk, H, W, 3) frame stack alone
        # is ~236 MB at chunk=64) are materialized once for warmup below
        # and then freed.
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
        _, outs = self.run(self._initial_state(), example)
        jax.block_until_ready(outs["plan_best"])
        del example, outs  # free the warmup buffers before serving
        self.warmup_seconds = _time.time() - t0
        # Serving observability: counters + a bounded latency ring (the
        # pipeline-side analog is utils/metrics.py JSONL).
        self.started_at = _time.time()
        self.request_counts: Dict[str, int] = {}
        self._infer_seconds: list = []  # last <=1024 inference wall times

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

        return {
            "uptime_seconds": round(_time.time() - self.started_at, 1),
            "warmup_seconds": round(self.warmup_seconds, 2),
            "sessions": n_sessions,
            "requests": counts,
            "infer_latency_ms": {"count": len(lat), "p50": pct(0.5), "p99": pct(0.99)},
            "frames_per_chunk": self.chunk,
        }

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
        return {
            f"leaf{i}": np.asarray(jax.device_get(l)) for i, l in enumerate(leaves)
        }

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
    def infer(self, sid: str, arrays: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        import jax
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

        import time as _time

        t0 = _time.time()
        with self._lock:
            if sid not in self.sessions:
                raise KeyError(sid)
            state = self.sessions[sid]
            new_state, outs = self.run(state, inputs)
            self.sessions[sid] = new_state
            self.sessions.move_to_end(sid)
            self._infer_seconds.append(_time.time() - t0)
            if len(self._infer_seconds) > 1024:
                del self._infer_seconds[: -1024]

        result = {k: np.asarray(jax.device_get(outs[k])) for k in _OUTPUT_KEYS}
        vs = jax.device_get(outs["vehicle_state"])
        for f in ("x", "y", "speed", "heading", "acceleration", "yaw_rate"):
            result[f"vehicle_{f}"] = np.asarray(getattr(vs, f))
        tags = outs.get("tags") or {}
        for k, v in tags.items():
            result[f"tag_{k}"] = np.asarray(jax.device_get(v))
        return result


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
):
    """Start the inference server; returns the HTTPServer when non-blocking."""
    ps = PipelineServer(
        cfg=cfg, chunk=chunk, artifact=artifact, max_sessions=max_sessions
    )
    httpd = ThreadingHTTPServer((host, port), make_handler(ps))
    httpd.pipeline_server = ps
    print(
        f"Serving AOT pipeline artifact ({ps.artifact_bytes} bytes, "
        f"{chunk}-frame chunks) on :{port} "
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
    )


if __name__ == "__main__":
    main()
