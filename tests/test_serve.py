"""Inference server: AOT artifact serving, sessions, chunk chaining."""

import io
import json
import urllib.request

import jax
import numpy as np

from multimodal_autonomous_driving_perception_and_planning_tpu import (
    DEFAULT_CONFIG,
    initial_state,
    make_sequence_runner,
)
from multimodal_autonomous_driving_perception_and_planning_tpu.apps.serve import serve
from multimodal_autonomous_driving_perception_and_planning_tpu.data.synthetic import (
    ego_motion_stream,
    simulated_detection_stream,
)

PORT = 8723
CHUNK = 10


def _post(path, data=b""):
    req = urllib.request.Request(
        f"http://127.0.0.1:{PORT}{path}", data=data, method="POST"
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.read(), r.headers.get("Content-Type", "")


def _chunk_npz(cfg, start, n):
    dets = simulated_detection_stream(
        n,
        height=cfg.frame_height,
        width=cfg.frame_width,
        capacity=cfg.detector.max_detections,
        start_frame_count=start + 1,
    )
    ego = ego_motion_stream(start + n, dt=1.0 / 30.0, seed=0)[start:]
    buf = io.BytesIO()
    np.savez(buf, ego_measurement=ego.astype(np.float32), **dets)
    return buf.getvalue(), dets, ego


def test_serve_sessions_and_chunk_chaining():
    cfg = DEFAULT_CONFIG.replace(use_frames=False, enable_tagging=True)
    httpd = serve(cfg=cfg, chunk=CHUNK, port=PORT, block=False)
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{PORT}/healthz", timeout=60
        ) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["frames_per_chunk"] == CHUNK

        with urllib.request.urlopen(f"http://127.0.0.1:{PORT}/info", timeout=60) as r:
            info = json.loads(r.read())
        assert info["artifact_bytes"] > 10_000

        body, _ = _post("/session")
        sid = json.loads(body)["session"]

        # Two 10-frame chunks through the server...
        outs = []
        all_inputs = []
        for start in (0, CHUNK):
            payload, dets, ego = _chunk_npz(cfg, start, CHUNK)
            all_inputs.append((dets, ego))
            raw, ctype = _post(f"/infer?session={sid}", payload)
            assert ctype == "application/octet-stream"
            with np.load(io.BytesIO(raw)) as z:
                outs.append({k: z[k] for k in z.files})

        # ...must equal one monolithic 20-frame scan (state chains).
        run = make_sequence_runner(cfg, donate=False)
        dets0, _ = all_inputs[0][0], None
        full_dets = {
            k: np.concatenate([all_inputs[0][0][k], all_inputs[1][0][k]])
            for k in all_inputs[0][0]
        }
        full_ego = ego_motion_stream(2 * CHUNK, dt=1.0 / 30.0, seed=0)
        inputs = {k: jax.numpy.asarray(v) for k, v in full_dets.items()}
        inputs["ego_measurement"] = jax.numpy.asarray(full_ego, jax.numpy.float32)
        _, direct = run(initial_state(cfg), inputs)

        got_ids = np.concatenate([o["track_id"] for o in outs])
        np.testing.assert_array_equal(got_ids, np.asarray(direct["track_id"]))
        got_speed = np.concatenate([o["vehicle_speed"] for o in outs])
        np.testing.assert_allclose(
            got_speed, np.asarray(direct["vehicle_state"].speed), rtol=0, atol=0
        )

        # Reset gives a fresh scan: chunk 0 again reproduces chunk-0 outputs.
        _post(f"/reset?session={sid}")
        payload, _, _ = _chunk_npz(cfg, 0, CHUNK)
        raw, _ = _post(f"/infer?session={sid}", payload)
        with np.load(io.BytesIO(raw)) as z:
            again = {k: z[k] for k in z.files}
        np.testing.assert_array_equal(again["track_id"], outs[0]["track_id"])

        # Shape errors surface as 400s with a message.
        bad = io.BytesIO()
        np.savez(bad, bbox=np.zeros((3, 2)))
        try:
            _post(f"/infer?session={sid}", bad.getvalue())
            raised = False
        except urllib.error.HTTPError as e:
            raised = True
            assert e.code == 400
        assert raised
    finally:
        httpd.shutdown()


def test_session_lru_eviction_and_delete():
    """Session table is bounded (LRU) and DELETE /session frees state."""
    from multimodal_autonomous_driving_perception_and_planning_tpu.apps.serve import (
        PipelineServer,
    )

    cfg = DEFAULT_CONFIG.replace(use_frames=False, enable_tagging=False)
    ps = PipelineServer(cfg=cfg, chunk=4, max_sessions=3)
    sids = [ps.create_session() for _ in range(3)]
    assert len(ps.sessions) == 3

    # Touch s0 so s1 becomes the LRU victim.
    ps.reset_session(sids[0])
    s_new = ps.create_session()
    assert len(ps.sessions) == 3
    assert sids[1] not in ps.sessions  # evicted
    assert sids[0] in ps.sessions and s_new in ps.sessions

    ps.delete_session(s_new)
    assert s_new not in ps.sessions
    try:
        ps.delete_session(s_new)
        raised = False
    except KeyError:
        raised = True
    assert raised


def test_session_export_import_continues_exactly():
    """GET/POST /session_state durability contract: export a session's
    carry after chunk 1, import it into a fresh session (as after a server
    restart), and chunk 2 must produce byte-identical outputs to the
    uninterrupted session."""
    from multimodal_autonomous_driving_perception_and_planning_tpu.apps.serve import (
        PipelineServer,
        _npz_bytes,
        _npz_load,
    )

    cfg = DEFAULT_CONFIG.replace(use_frames=False, enable_tagging=True)
    ps = PipelineServer(cfg=cfg, chunk=4, max_sessions=4)
    sid = ps.create_session()

    def chunk_arrays(start):
        dets = simulated_detection_stream(
            4,
            height=cfg.frame_height,
            width=cfg.frame_width,
            capacity=cfg.detector.max_detections,
            start_frame_count=start + 1,
        )
        ego = ego_motion_stream(start + 4, dt=1.0 / 30.0, seed=0)[start:]
        return {**dets, "ego_measurement": ego.astype(np.float32)}

    ps.infer(sid, chunk_arrays(0))
    exported = _npz_load(_npz_bytes(ps.export_session(sid)))  # npz round-trip

    out_live = ps.infer(sid, chunk_arrays(4))
    sid2 = ps.import_session(exported)
    out_restored = ps.infer(sid2, chunk_arrays(4))

    assert sorted(out_live) == sorted(out_restored)
    for k in out_live:
        np.testing.assert_array_equal(out_live[k], out_restored[k], err_msg=k)

    # Malformed imports answer with a clear error, not a corrupt session.
    try:
        ps.import_session({"leaf0": np.zeros(3)})
        raised = False
    except ValueError as e:
        raised = True
        assert "leaf" in str(e)
    assert raised

    # /metrics observability: the three infers above are measured.
    m = ps.metrics()
    assert m["infer_latency_ms"]["count"] == 3
    assert m["infer_latency_ms"]["p50"] > 0
    assert m["sessions"] == 2 and m["uptime_seconds"] >= 0
    ps.count_request("GET /healthz")
    assert ps.metrics()["requests"] == {"GET /healthz": 1}
