#!/usr/bin/env python3
"""Stdlib-only line-coverage gate check (no coverage.py in this image).

Uses sys.monitoring (PEP 669, Python 3.12+) to record executed lines in
``climate_sim_tpu`` and ``visualization`` while running the pytest suite
in-process, then compares against the executable-line sets derived from
each module's code objects (``co_lines``).  This approximates the CI gate
``pytest --cov --cov-fail-under=90`` (reference contract: gcovr.cfg
fail-under-line=90, reference .github/workflows/ci.yml:44-55) closely
enough to validate the threshold locally before pushing.

Usage:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/coverage_check.py [pytest args...]

Exits nonzero when total line coverage < --fail-under (default 90).
"""

from __future__ import annotations

import argparse
import os
import sys
from collections import defaultdict

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TARGET_DIRS = (
    os.path.join(REPO_ROOT, "climate_sim_tpu"),
    os.path.join(REPO_ROOT, "visualization"),
)

TOOL_ID = sys.monitoring.COVERAGE_ID


def _is_target(path: str) -> bool:
    return path.startswith(TARGET_DIRS) and path.endswith(".py")


def _executable_lines(path: str) -> set[int]:
    """All line numbers that carry bytecode, from the compiled module tree."""
    with open(path, "rb") as fh:
        source = fh.read()
    code = compile(source, path, "exec")
    lines: set[int] = set()
    stack = [code]
    while stack:
        co = stack.pop()
        for _start, _end, lineno in co.co_lines():
            if lineno is not None:
                lines.add(lineno)
        for const in co.co_consts:
            if hasattr(const, "co_lines"):
                stack.append(const)
    # Module docstring/def lines execute at import; RESUME pseudo-lines on
    # ``def``/``class`` statements are real executable lines too.  No
    # filtering needed beyond what co_lines gives us.
    return lines


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--fail-under", type=float, default=90.0)
    ap.add_argument("--show-missing", action="store_true")
    ap.add_argument("pytest_args", nargs="*", default=[])
    args = ap.parse_args()

    executed: dict[str, set[int]] = defaultdict(set)

    def on_line(code, lineno):
        fname = code.co_filename
        if _is_target(fname):
            executed[fname].add(lineno)
        # Once recorded (or known off-target) this location never needs to
        # fire again — DISABLE is per-code-location, not per-tool.
        return sys.monitoring.DISABLE

    sys.monitoring.use_tool_id(TOOL_ID, "coverage_check")
    sys.monitoring.register_callback(
        TOOL_ID, sys.monitoring.events.LINE, on_line
    )
    sys.monitoring.set_events(TOOL_ID, sys.monitoring.events.LINE)

    import pytest

    pytest_args = args.pytest_args or ["tests/", "-q"]
    rc = pytest.main(pytest_args)

    sys.monitoring.set_events(TOOL_ID, 0)
    sys.monitoring.free_tool_id(TOOL_ID)

    total_exec = 0
    total_hit = 0
    rows = []
    for target in TARGET_DIRS:
        for dirpath, _dirnames, filenames in os.walk(target):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                path = os.path.join(dirpath, fn)
                lines = _executable_lines(path)
                hit = executed.get(path, set()) & lines
                total_exec += len(lines)
                total_hit += len(hit)
                pct = 100.0 * len(hit) / len(lines) if lines else 100.0
                rel = os.path.relpath(path, REPO_ROOT)
                rows.append((rel, len(lines), len(hit), pct,
                             sorted(lines - hit)))

    width = max(len(r[0]) for r in rows) if rows else 10
    print(f"\n{'file':<{width}}  stmts   hit    cover")
    for rel, n, h, pct, missing in rows:
        print(f"{rel:<{width}}  {n:5d}  {h:5d}  {pct:6.1f}%")
        if args.show_missing and missing and pct < 100.0:
            print(f"  missing: {_compress(missing)}")
    total_pct = 100.0 * total_hit / total_exec if total_exec else 100.0
    print(f"\nTOTAL: {total_hit}/{total_exec} lines = {total_pct:.2f}%")

    if rc != 0:
        print("pytest FAILED", file=sys.stderr)
        return int(rc)
    if total_pct < args.fail_under:
        print(f"coverage {total_pct:.2f}% < fail-under {args.fail_under}%",
              file=sys.stderr)
        return 2
    print(f"coverage gate OK (>= {args.fail_under}%)")
    return 0


def _compress(lines: list[int]) -> str:
    """Render sorted line numbers as compact ranges: 3-5, 9, 12-14."""
    out = []
    start = prev = lines[0]
    for ln in lines[1:] + [None]:
        if ln is not None and ln == prev + 1:
            prev = ln
            continue
        out.append(str(start) if start == prev else f"{start}-{prev}")
        if ln is not None:
            start = prev = ln
    return ", ".join(out)


if __name__ == "__main__":
    sys.exit(main())
