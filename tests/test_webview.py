"""Stdlib web dashboard: endpoints serve frames, tags, stats, search."""

import json
import urllib.request

from multimodal_autonomous_driving_perception_and_planning_tpu.apps.webview import serve


def test_webview_endpoints():
    server = serve(port=8719, num_frames=8, block=False)
    try:
        base = "http://127.0.0.1:8719"
        html = urllib.request.urlopen(base + "/").read().decode()
        assert "Dashboard" in html and 'max="7"' in html

        jpg = urllib.request.urlopen(base + "/frame?i=3").read()
        assert jpg[:2] == b"\xff\xd8"  # JPEG magic

        tags = json.loads(urllib.request.urlopen(base + "/tags?i=3").read())
        assert "all_tags" in tags and "speed_kmh" in tags["state"]

        stats = json.loads(urllib.request.urlopen(base + "/stats").read())
        assert stats["total_frames"] == 8

        road = tags["all_tags"][0]
        hits = json.loads(
            urllib.request.urlopen(base + "/search?q=" + road).read()
        )
        assert 3 in hits["frames"]

        # Out-of-range frame index clamps instead of erroring.
        jpg2 = urllib.request.urlopen(base + "/frame?i=999").read()
        assert jpg2[:2] == b"\xff\xd8"
    finally:
        server.shutdown()
