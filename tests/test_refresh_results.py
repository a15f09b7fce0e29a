"""tools/refresh_results.py: the mechanical results-file refresh.

This tool is the only writer of benchmarks/results_tpu_v5e.txt (the
recorded on-hardware numbers), so its failure modes matter: a suite run
containing ``*_ERROR`` isolation lines must never be written as results,
comment headers must survive the rewrite, and dropped metrics must be
called out rather than silently vanishing.
"""

import importlib.util
import json
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "refresh_results", REPO / "tools" / "refresh_results.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _line(metric, value, unit="frames/s"):
    return json.dumps({"metric": metric, "value": value, "unit": unit})


def test_parse_keeps_metrics_comments_and_errors():
    tool = _load_tool()
    metrics, comments, errors = tool.parse(
        [
            "# header comment",
            _line("e2e_fps", 29805.0),
            "WARNING: stray runtime noise",
            json.dumps({"metric": "yolo_ERROR", "error": "compile timeout"}),
            "{not json",
            "",
        ]
    )
    assert metrics == {
        "e2e_fps": {"metric": "e2e_fps", "value": 29805.0, "unit": "frames/s"}
    }
    assert comments == ["# header comment"]
    assert [e["metric"] for e in errors] == ["yolo_ERROR"]


def test_write_replaces_results_and_reports_deltas(tmp_path, monkeypatch, capsys):
    tool = _load_tool()
    results = tmp_path / "results.txt"
    results.write_text(_line("e2e_fps", 20000.0) + "\n" + _line("gone", 1.0) + "\n")
    monkeypatch.setattr(tool, "RESULTS", results)

    run = tmp_path / "suite.out"
    run.write_text("# run header\n" + _line("e2e_fps", 30000.0) + "\n")
    assert tool.main([str(run), "--write"]) == 0
    out = capsys.readouterr().out
    assert "+50.0%" in out  # 20000 -> 30000
    assert "gone" in out and "WARNING" in out  # dropped metric is loud

    body = results.read_text()
    assert body.startswith("# run header\n")
    new_m, _, _ = tool.parse(body.splitlines())
    assert new_m["e2e_fps"]["value"] == 30000.0
    assert "gone" not in new_m


def test_refuses_to_write_a_run_with_errors(tmp_path, monkeypatch):
    tool = _load_tool()
    results = tmp_path / "results.txt"
    results.write_text(_line("e2e_fps", 20000.0) + "\n")
    monkeypatch.setattr(tool, "RESULTS", results)

    run = tmp_path / "suite.out"
    run.write_text(
        _line("e2e_fps", 30000.0)
        + "\n"
        + json.dumps({"metric": "dense_ERROR", "error": "device lost"})
        + "\n"
    )
    assert tool.main([str(run), "--write"]) == 1
    kept, _, _ = tool.parse(results.read_text().splitlines())
    assert kept["e2e_fps"]["value"] == 20000.0  # untouched
