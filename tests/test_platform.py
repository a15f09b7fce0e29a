"""utils.platform + bench.py device-probe fail-fast.

This environment's sitecustomize registers the axon TPU backend and
overrides ``jax.config.jax_platforms`` — the helper restores standard
``JAX_PLATFORMS`` env-var semantics for every CLI entry point, and bench.py
refuses to hang when the device backend is unreachable (prints an error
JSON line and exits 1 instead).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_apply_platform_env_wins_over_config():
    """In a fresh interpreter with JAX_PLATFORMS=cpu, the helper must force
    the config to cpu even though sitecustomize registered axon first."""
    code = (
        "from multimodal_autonomous_driving_perception_and_planning_tpu."
        "utils.platform import apply_platform_env\n"
        "applied = apply_platform_env()\n"
        "import jax\n"
        "assert applied == 'cpu', applied\n"
        "assert jax.config.jax_platforms == 'cpu', jax.config.jax_platforms\n"
        "assert jax.devices()[0].platform == 'cpu'\n"
        "print('PLATFORM_OK')\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "PLATFORM_OK" in proc.stdout


def test_apply_platform_env_noop_when_unset():
    code = (
        "import os\n"
        "os.environ.pop('JAX_PLATFORMS', None)\n"
        "from multimodal_autonomous_driving_perception_and_planning_tpu."
        "utils.platform import apply_platform_env\n"
        "assert apply_platform_env() is None\n"
        "print('NOOP_OK')\n"
    )
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "NOOP_OK" in proc.stdout


def test_bench_fails_fast_when_device_unreachable(monkeypatch, capsys):
    """With the device probe reporting unreachable, bench.main() prints one
    parseable error JSON line and exits 1 — it must never hang."""
    sys.path.insert(0, str(REPO))
    try:
        import bench
    finally:
        sys.path.pop(0)

    monkeypatch.setattr(bench, "_probe_device", lambda: None)
    try:
        bench.main()
        raise AssertionError("bench.main() should sys.exit(1)")
    except SystemExit as e:
        assert e.code == 1
    out = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(out[-1])
    assert rec["metric"] == "e2e_frames_per_sec_per_chip"
    assert rec["value"] is None
    assert "unreachable" in rec["error"]
