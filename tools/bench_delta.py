"""Per-query bench regression report.

Compares two ``bench_queries.json`` snapshots and prints every query
whose time moved more than ``--factor`` (default 1.5x) in either
direction, so constant-factor slips (like round 4's topk_lsh
0.82 -> 2.23 s) surface at build time instead of judge time.

Usage:
    python tools/bench_delta.py                 # git HEAD copy vs working copy
    python tools/bench_delta.py OLD.json NEW.json
    python tools/bench_delta.py --factor 2.0

Exit code 1 if any regression (slowdown) exceeds the factor; speedups
are reported but never fail the check.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys

MIN_ABS_SEC = 0.3  # ignore sub-noise queries: 0.1 -> 0.2 s is not a signal


def load(path: str) -> dict[str, float]:
    with open(path) as fh:
        d = json.load(fh)
    return {k: v for k, v in d.get("queries", d).items() if isinstance(v, (int, float))}


def load_git(rev: str, path: str = "bench_queries.json") -> dict[str, float]:
    out = subprocess.run(
        ["git", "show", f"{rev}:{path}"], capture_output=True, text=True, check=True
    ).stdout
    d = json.loads(out)
    return {k: v for k, v in d.get("queries", d).items() if isinstance(v, (int, float))}


def delta(
    old: dict[str, float], new: dict[str, float], factor: float
) -> tuple[list[tuple[str, float, float, float]], list[tuple[str, float, float, float]]]:
    slower, faster = [], []
    for name, nt in sorted(new.items()):
        ot = old.get(name)
        if ot is None or max(ot, nt) < MIN_ABS_SEC:
            continue
        if nt > ot * factor:
            slower.append((name, ot, nt, nt / ot))
        elif ot > nt * factor:
            faster.append((name, ot, nt, nt / ot))
    return slower, faster


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old", nargs="?", default=None)
    ap.add_argument("new", nargs="?", default="bench_queries.json")
    ap.add_argument("--factor", type=float, default=1.5)
    args = ap.parse_args()

    old = load(args.old) if args.old else load_git("HEAD")
    new = load(args.new)
    slower, faster = delta(old, new, args.factor)

    for name, ot, nt, r in slower:
        print(f"REGRESSED {name}: {ot:.2f} -> {nt:.2f} s ({r:.2f}x)")
    for name, ot, nt, r in faster:
        print(f"improved  {name}: {ot:.2f} -> {nt:.2f} s ({r:.2f}x)")
    if not slower and not faster:
        print(f"no per-query move >{args.factor}x (floor {MIN_ABS_SEC}s)")
    return 1 if slower else 0


if __name__ == "__main__":
    sys.exit(main())
