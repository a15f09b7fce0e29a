"""Stdlib web dashboard: progressive serving + endpoint contracts."""

import json
import time
import urllib.parse
import urllib.request

from multimodal_autonomous_driving_perception_and_planning_tpu.apps.webview import serve


def test_webview_progressive_endpoints(tmp_path):
    server = serve(port=8719, num_frames=8, block=False, progressive=True)
    try:
        base = "http://127.0.0.1:8719"
        # Server is reachable immediately, before processing completes.
        html = urllib.request.urlopen(base + "/").read().decode()
        assert "Dashboard" in html and "/status" in html

        status = json.loads(urllib.request.urlopen(base + "/status").read())
        assert status["total"] == 8 and 0 <= status["ready"] <= 8

        # Poll until all chunks have landed.
        deadline = time.time() + 120
        while time.time() < deadline:
            status = json.loads(urllib.request.urlopen(base + "/status").read())
            assert status["error"] is None, status["error"]
            if status["ready"] == 8:
                break
            time.sleep(0.3)
        assert status["ready"] == 8

        jpg = urllib.request.urlopen(base + "/frame?i=3").read()
        assert jpg[:2] == b"\xff\xd8"  # JPEG magic

        tags = json.loads(urllib.request.urlopen(base + "/tags?i=3").read())
        assert "all_tags" in tags and "speed_kmh" in tags["state"]

        stats = json.loads(urllib.request.urlopen(base + "/stats").read())
        assert stats["total_frames"] == 8

        # Ego state-history series for the 2x2 plots (reference
        # create_state_plots, app.py:194-257): one point per ready frame.
        hist = json.loads(urllib.request.urlopen(base + "/history").read())
        for k in ("speed_kmh", "heading_deg", "accel", "x", "y"):
            assert len(hist[k]) == 8, k
        assert all(isinstance(v, (int, float)) for v in hist["speed_kmh"])

        road = tags["all_tags"][0]
        hits = json.loads(
            urllib.request.urlopen(base + "/search?q=" + road).read()
        )
        assert 3 in hits["frames"]

        # Out-of-range frame index clamps instead of erroring.
        jpg2 = urllib.request.urlopen(base + "/frame?i=999").read()
        assert jpg2[:2] == b"\xff\xd8"

        # POST /save persists the session to SQLite (reference app.py:522-529)
        # and the saved rows answer a tag query.
        db = str(tmp_path / "tags.db")
        req = urllib.request.Request(
            base + "/save?db=" + urllib.parse.quote(db), method="POST"
        )
        saved = json.loads(urllib.request.urlopen(req).read())
        assert saved["frames_saved"] == 8 and saved["db_path"] == db
        from multimodal_autonomous_driving_perception_and_planning_tpu.database import (
            TagDatabase,
        )

        tdb = TagDatabase(db)
        try:
            assert len(tdb.search_by_tag(road)) == len(hits["frames"])
        finally:
            tdb.close()

        # Non-numeric index answers 400, not a dropped connection.
        try:
            urllib.request.urlopen(base + "/frame?i=abc")
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()


def test_webview_chunked_equals_monolithic():
    """Progressive chunking must not change results: tags/states equal the
    synchronous whole-clip build."""
    from multimodal_autonomous_driving_perception_and_planning_tpu.apps.webview import (
        DashboardData,
        build_dashboard_data,
        process_into,
    )

    mono = build_dashboard_data(num_frames=10)

    prog = DashboardData(total=10)
    process_into(prog, 10, chunk=4)  # 4 + 4 + 2

    assert [ft.all_tags for ft in prog.frame_tags] == [
        ft.all_tags for ft in mono.frame_tags
    ]
    assert prog.states == mono.states
