"""Zero-dependency web dashboard (stdlib http.server).

Functional stand-in for the reference's Streamlit dashboard when streamlit
is unavailable: processes a sequence once through the fused device pipeline,
then serves an interactive scrubber over the rendered frames plus live tag
statistics, high-risk listing, and tag search — the same surfaces as
app.py's three tabs (Live View / Auto-Tags / Metrics & Search).

Run: python app.py --backend web [--video path | --synthetic] [--port 8700]
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><title>AV Pipeline Dashboard</title>
<style>
 body { font-family: sans-serif; background: #111; color: #eee; margin: 20px; }
 img { border: 1px solid #333; max-width: 100%; }
 .row { display: flex; gap: 20px; flex-wrap: wrap; }
 .card { background: #1c1c1c; padding: 14px; border-radius: 8px; margin-top: 14px; }
 input[type=range] { width: 100%; }
 .tag { display: inline-block; background: #2d4f67; border-radius: 10px;
        padding: 2px 9px; margin: 2px; font-size: 13px; }
 .risk-high, .risk-critical { background: #7a2d2d; }
 pre { white-space: pre-wrap; }
</style></head>
<body>
<h2>Multimodal AV Perception &amp; Planning — TPU Pipeline Dashboard</h2>
<div class="card">
  <input type="range" id="slider" min="0" max="{max_frame}" value="0">
  <div>Frame <span id="fidx">0</span> / {max_frame}</div>
</div>
<div class="row">
  <div class="card"><h3>Combined view</h3><img id="view" src="/frame?i=0" width="900"></div>
  <div class="card" style="min-width:300px"><h3>Frame tags</h3><div id="tags"></div>
    <h3>Vehicle state</h3><pre id="state"></pre></div>
</div>
<div class="row">
  <div class="card" style="flex:1"><h3>Tag statistics</h3><pre id="stats"></pre></div>
  <div class="card" style="flex:1"><h3>Search</h3>
    <input id="q" placeholder="tag or description, e.g. risk_high">
    <button onclick="search()">Search</button><pre id="results"></pre></div>
</div>
<script>
const slider = document.getElementById('slider');
function update(i) {
  document.getElementById('fidx').textContent = i;
  document.getElementById('view').src = '/frame?i=' + i;
  fetch('/tags?i=' + i).then(r => r.json()).then(d => {
    document.getElementById('tags').innerHTML =
      d.all_tags.map(t => `<span class="tag risk-${t.replace('risk_','')}">${t}</span>`).join('');
    document.getElementById('state').textContent = JSON.stringify(d.state, null, 1);
  });
}
slider.oninput = () => update(slider.value);
fetch('/stats').then(r => r.json()).then(d => {
  document.getElementById('stats').textContent = JSON.stringify(d, null, 1);
});
function search() {
  fetch('/search?q=' + encodeURIComponent(document.getElementById('q').value))
    .then(r => r.json()).then(d => {
      document.getElementById('results').textContent =
        d.frames.length ? 'Frames: ' + d.frames.join(', ') : 'No matches';
    });
}
update(0);
</script></body></html>
"""


class DashboardData:
    """Precomputed per-frame renders + tags backing the HTTP endpoints."""

    def __init__(self, frames_jpeg, frame_tags, states, tagger):
        self.frames_jpeg = frames_jpeg
        self.frame_tags = frame_tags
        self.states = states
        self.tagger = tagger


def build_dashboard_data(
    num_frames: int = 120,
    video_path: Optional[str] = None,
    use_frames: bool = True,
) -> DashboardData:
    import cv2
    import jax
    import jax.numpy as jnp

    from .. import DEFAULT_CONFIG, initial_state, make_sequence_runner
    from ..data.frames import SyntheticRoadGenerator
    from ..host import extract_frame
    from ..tagging.auto_tagger import AutoTagger
    from ..viz import BEVRenderer, OverlayRenderer, draw_detections, draw_lanes, draw_tracks
    from .demo import _build_inputs, _enable_persistent_compile_cache

    _enable_persistent_compile_cache()
    cfg = DEFAULT_CONFIG.replace(use_frames=use_frames, enable_tagging=True)

    if video_path:
        from ..data.video import VideoDataLoader

        loader = VideoDataLoader(video_path, target_size=(cfg.frame_width, cfg.frame_height))
        num_frames = min(num_frames, loader.total_frames)
        frames = loader.load_frames(num_frames)
        loader.release()
        src_name = video_path
    else:
        gen = SyntheticRoadGenerator(cfg.frame_width, cfg.frame_height)
        frames = gen.generate_frames(num_frames)
        src_name = "synthetic"

    dets, inputs = _build_inputs(frames, num_frames, 1 / 30.0, use_frames, cfg)
    runner = make_sequence_runner(cfg, donate=False)
    _, outs = runner(initial_state(cfg), inputs)
    outs = jax.device_get(outs)

    tagger = AutoTagger(video_path=src_name, fps=30.0)
    tagger.ingest_device_tags(outs["tags"], num_frames)
    tagger.finalize()

    bev = BEVRenderer(cfg.bev)
    overlay = OverlayRenderer()
    jpegs, tags_list, states = [], [], []
    for f in range(num_frames):
        res = extract_frame(outs, dets, f)
        cam = frames[f].copy()
        cam = draw_detections(cam, res.detections)
        cam = draw_lanes(cam, res.lane_left, res.lane_right)
        cam = draw_tracks(cam, res.tracks)
        cam = overlay.draw_info_panel(cam, res.vehicle_state, fps=30.0, frame_num=f)
        bev_img = bev.render(
            ego_state=res.vehicle_state,
            tracks=res.tracks,
            planned_trajectory=res.optimal_trajectory,
            candidate_trajectories=res.candidate_trajectories[:10],
            show_grid=True,
        )
        combined = overlay.create_side_by_side(cam, bev_img)
        ok, buf = cv2.imencode(".jpg", combined, [cv2.IMWRITE_JPEG_QUALITY, 82])
        jpegs.append(buf.tobytes() if ok else b"")
        tags_list.append(tagger.frame_tags[f])
        vs = res.vehicle_state
        states.append(
            {
                "speed_kmh": round(vs.speed * 3.6, 1),
                "heading_deg": round(float(np.degrees(vs.heading)), 1),
                "accel": round(vs.acceleration, 2),
                "x": round(vs.x, 1),
                "y": round(vs.y, 1),
                "tracks": len(res.tracks),
                "plan": res.optimal_trajectory.trajectory_type,
            }
        )
    return DashboardData(jpegs, tags_list, states, tagger)


def make_handler(data: DashboardData):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def _send(self, body: bytes, ctype: str = "text/html"):
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urlparse(self.path)
            q = parse_qs(url.query)
            n = len(data.frames_jpeg)
            if url.path == "/":
                self._send(_PAGE.replace("{max_frame}", str(n - 1)).encode())
            elif url.path == "/frame":
                i = min(max(int(q.get("i", ["0"])[0]), 0), n - 1)
                self._send(data.frames_jpeg[i], "image/jpeg")
            elif url.path == "/tags":
                i = min(max(int(q.get("i", ["0"])[0]), 0), n - 1)
                ft = data.frame_tags[i]
                self._send(
                    json.dumps(
                        {"all_tags": ft.all_tags, "state": data.states[i]}
                    ).encode(),
                    "application/json",
                )
            elif url.path == "/stats":
                self._send(
                    json.dumps(data.tagger.get_tag_statistics()).encode(),
                    "application/json",
                )
            elif url.path == "/search":
                query = q.get("q", [""])[0]
                hits = [ft.frame_idx for ft in data.tagger.search_by_tag(query)]
                self._send(
                    json.dumps({"query": query, "frames": hits}).encode(),
                    "application/json",
                )
            else:
                self.send_response(404)
                self.end_headers()

    return Handler


def serve(
    port: int = 8700,
    num_frames: int = 120,
    video_path: Optional[str] = None,
    block: bool = True,
):
    print(f"Processing {num_frames} frames through the device pipeline...")
    data = build_dashboard_data(num_frames, video_path)
    server = ThreadingHTTPServer(("0.0.0.0", port), make_handler(data))
    print(f"Dashboard: http://localhost:{port}/")
    if block:
        server.serve_forever()
    else:
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        return server
