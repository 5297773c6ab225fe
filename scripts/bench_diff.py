"""Mechanical bench regression differ (round-11 verdict item 7).

HISTORY.md documents ±25-50% host-weather swings on IDENTICAL code, so a
raw per-query comparison of BENCH_r{N}.json against BENCH_r{N-1}.json is
archaeology: every line moved, and the reader has to guess which moves
are real. This script makes the comparison mechanical:

1. join the two rounds per query (and per composite part when both
   sides carry BENCH_DETAIL-style part timings),
2. estimate the sweep-wide HOST-WEATHER factor as the MEDIAN per-query
   ratio — the one number that moves every query together when the box
   is busy (median, not mean: a genuinely regressed query must not drag
   the normalizer),
3. report each query's RESIDUAL ratio (raw ratio / median) and flag
   residuals outside [1/threshold, threshold] (default 1.5x) as
   real moves worth reading code for.

Usage:
    python scripts/bench_diff.py                 # latest two BENCH_r*.json
    python scripts/bench_diff.py OLD.json NEW.json [--threshold 1.5]
    python scripts/bench_diff.py --parts OLD_DETAIL.json NEW_DETAIL.json

Output: one human table on stdout plus a final JSON line
{"median_ratio": ..., "flagged": {...}} the round log can commit.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import statistics
import sys


def _latest_two(repo: str) -> tuple[str, str]:
    rounds = sorted(
        glob.glob(os.path.join(repo, "BENCH_r*.json")),
        key=lambda p: int("".join(ch for ch in os.path.basename(p) if ch.isdigit())),
    )
    if len(rounds) < 2:
        raise SystemExit("need two BENCH_r*.json files to diff")
    return rounds[-2], rounds[-1]


def _timings(path: str, parts: bool) -> dict[str, float]:
    d = json.load(open(path))
    if isinstance(d.get("parsed"), dict):
        d = d["parsed"]  # driver BENCH_r{N}.json wraps bench.py's line
    if parts and "composite_part_timings" in d:
        return {k: float(v) for k, v in d["composite_part_timings"].items()}
    return {k: float(v) for k, v in (d.get("queries") or {}).items()}


def bench_diff(
    old_path: str, new_path: str, threshold: float = 1.5, parts: bool = False
) -> dict:
    old, new = _timings(old_path, parts), _timings(new_path, parts)
    common = sorted(set(old) & set(new))
    if not common:
        raise SystemExit("no common query keys between the two files")
    ratios = {
        q: (new[q] / old[q]) if old[q] > 0 else float("inf") for q in common
    }
    finite = [r for r in ratios.values() if r != float("inf")]
    med = statistics.median(finite) if finite else 1.0
    rows = []
    flagged = {}
    for q in common:
        resid = ratios[q] / med if med > 0 else float("inf")
        mark = ""
        if resid > threshold or resid < 1 / threshold:
            mark = "REGRESSED" if resid > 1 else "IMPROVED"
            flagged[q] = round(resid, 3)
        rows.append((q, old[q], new[q], ratios[q], resid, mark))
    w = max(len(q) for q in common)
    print(f"{'query/part'.ljust(w)}  {'old':>8} {'new':>8} {'ratio':>7} "
          f"{'resid':>7}  flag")
    for q, o, n, r, resid, mark in rows:
        print(f"{q.ljust(w)}  {o:8.2f} {n:8.2f} {r:7.2f} {resid:7.2f}  {mark}")
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_old:
        print(f"dropped since old: {only_old}")
    if only_new:
        print(f"new since old: {only_new}")
    out = {
        "old": os.path.basename(old_path),
        "new": os.path.basename(new_path),
        "median_ratio": round(med, 3),
        "threshold": threshold,
        "n_compared": len(common),
        "flagged": flagged,
        "added": only_new,
        "removed": only_old,
    }
    print(json.dumps(out, sort_keys=True))
    return out


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("old", nargs="?", help="older BENCH json")
    ap.add_argument("new", nargs="?", help="newer BENCH json")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument(
        "--parts", action="store_true",
        help="diff composite_part_timings (BENCH_DETAIL files) instead "
        "of top-level queries",
    )
    args = ap.parse_args(argv)
    if (args.old is None) != (args.new is None):
        ap.error("pass both files or neither")
    if args.old is None:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        args.old, args.new = _latest_two(repo)
        print(f"diffing {args.old} -> {args.new}", file=sys.stderr)
    bench_diff(args.old, args.new, args.threshold, args.parts)


if __name__ == "__main__":
    main()
