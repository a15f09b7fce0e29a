#!/usr/bin/env python
"""Refresh benchmarks/results_tpu_v5e.txt from a suite run and print deltas.

Usage:
  python tools/refresh_results.py /tmp/suite_r4.out [--write]

Reads a `benchmarks/suite.py` stdout capture, keeps the metric JSON lines
and the `#` header comments (drops stray runtime warnings), prints a
metric-by-metric comparison against the current results file, and with
``--write`` replaces the results file.  Errors (``*_ERROR`` lines from the
suite's failure isolation) are surfaced loudly and never written as
results.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

RESULTS = Path(__file__).resolve().parents[1] / "benchmarks" / "results_tpu_v5e.txt"


def parse(lines):
    metrics, comments, errors = {}, [], []
    for line in lines:
        line = line.strip()
        if not line:
            continue
        if line.startswith("#"):
            comments.append(line)
            continue
        if not line.startswith("{"):
            continue
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        name = rec.get("metric", "")
        if name.endswith("_ERROR"):
            errors.append(rec)
        elif name:
            metrics[name] = rec
    return metrics, comments, errors


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print(__doc__)
        return 2
    src = Path(argv[0])
    write = "--write" in argv
    new_m, new_c, errors = parse(src.read_text().splitlines())
    old_m, _, _ = parse(
        RESULTS.read_text().splitlines() if RESULTS.exists() else []
    )

    if errors:
        print("SUITE ERRORS (fix before refreshing):")
        for rec in errors:
            print(f"  {rec['metric']}: {rec.get('error')}")

    names = list(dict.fromkeys([*old_m, *new_m]))
    print(f"{'metric':44s} {'old':>12s} {'new':>12s} {'delta':>8s}")
    for n in names:
        o = old_m.get(n, {}).get("value")
        v = new_m.get(n, {}).get("value")
        if isinstance(o, (int, float)) and isinstance(v, (int, float)) and o:
            d = f"{(v / o - 1) * 100:+.1f}%"
        else:
            d = "-"
        fmt = lambda x: f"{x:,.1f}" if isinstance(x, (int, float)) else "-"
        print(f"{n:44s} {fmt(o):>12s} {fmt(v):>12s} {d:>8s}")

    missing = [n for n in old_m if n not in new_m]
    if missing:
        print(f"\nWARNING: metrics in the current file but not the new run: {missing}")

    if write:
        if errors:
            print("\nrefusing to --write: the run has errors")
            return 1
        body = "\n".join([*new_c, *(json.dumps(new_m[n]) for n in new_m)]) + "\n"
        RESULTS.write_text(body)
        print(f"\nwrote {RESULTS} ({len(new_m)} metrics)")
    else:
        print("\n(dry run — pass --write to replace the results file)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
