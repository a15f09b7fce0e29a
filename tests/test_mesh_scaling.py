"""Multi-chip scaling tracked as numbers (tools/mesh_scaling.py).

The dryrun proves the sharded programs execute; these tests prove the
work actually *partitions*: XLA cost-analysis flops of the per-device
program must fall ~1/D as the camera / session-lane axis is sharded over
D devices.  Deterministic (no timing), so it runs in CI on the conftest's
8 virtual CPU devices and catches sharding regressions (replicated
compute, a stray gathered batch) that a boolean dryrun cannot.
"""

import importlib.util
import json
from pathlib import Path

import jax
import pytest

REPO = Path(__file__).resolve().parents[1]


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "mesh_scaling", REPO / "tools" / "mesh_scaling.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def rows():
    if jax.device_count() < 8:
        pytest.skip("needs the conftest's 8 virtual devices")
    tool = _load_tool()
    return tool.collect_rows(frames=8, reps=1)


def test_rows_cover_both_modes_and_all_device_counts(rows):
    got = {(r["mode"], r["devices"]) for r in rows}
    assert got == {
        (m, d) for m in ("multicam8", "serve_dp") for d in (1, 2, 4, 8)
    }


def test_flops_per_device_scale_inverse_with_d(rows):
    for mode in ("multicam8", "serve_dp"):
        sub = {r["devices"]: r for r in rows if r["mode"] == mode}
        base = sub[1]["flops_per_device"]
        assert base > 0
        for d in (2, 4, 8):
            ratio = sub[d]["flops_per_device"] / base
            # Ideal is 1/d; small fixed per-device overhead (final psum /
            # host-gather glue) keeps it slightly above at tiny shapes.
            assert ratio < 1.25 / d, (mode, d, ratio)
            assert not sub[d]["regression"]


def test_regression_flag_trips_on_flat_flops():
    """The tool's own verdict code (apply_verdicts): a flat flops curve —
    replicated compute — must flag every D>1 row."""
    tool = _load_tool()
    rows = tool.apply_verdicts(
        [
            dict(mode="multicam8", devices=d, flops_per_device=100.0)
            for d in (1, 2, 4, 8)
        ]
    )
    assert [r["regression"] for r in rows] == [False, True, True, True]


def test_unavailable_cost_analysis_is_a_failure_not_a_pass():
    """NaN flops (cost_analysis raised) must flag, never read as clean."""
    tool = _load_tool()
    rows = tool.apply_verdicts(
        [
            dict(mode="serve_dp", devices=d, flops_per_device=float("nan"))
            for d in (1, 2, 4, 8)
        ]
    )
    assert all(r["regression"] for r in rows)
    assert all(r["error"] == "cost_analysis_unavailable" for r in rows)
    assert all(r["flops_ratio_vs_d1"] is None for r in rows)


def test_ideal_scaling_passes_the_verdict():
    rows = _load_tool().apply_verdicts(
        [
            dict(mode="multicam8", devices=d, flops_per_device=800.0 / d)
            for d in (1, 2, 4, 8)
        ]
    )
    assert not any(r["regression"] for r in rows)


def test_committed_artifact_matches_schema_and_is_clean():
    """The committed JSONL (refreshed by the tool) has no flagged rows —
    a regression would have failed the tool run that produced it."""
    art = REPO / "benchmarks" / "artifacts" / "mesh_scaling.jsonl"
    if not art.exists():
        pytest.skip("artifact not yet generated")
    rows = [json.loads(line) for line in art.read_text().splitlines() if line]
    assert len(rows) == 8
    for r in rows:
        assert r["mode"] in ("multicam8", "serve_dp")
        assert not r["regression"], r
