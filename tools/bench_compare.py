"""Compare two bench JSON records and flag per-query drift.

The EXT/HEADLINE trend discipline (BENCH_NOTES): absolute seconds are
not comparable across boots, so regressions are judged per query —
within the suite, >2x drift on one query while the suite median moves
far less is a real plan regression, not noise. This tool mechanizes
that read.

Usage:

    python tools/bench_compare.py BENCH_r04.json BENCH_r05.json
    python tools/bench_compare.py old.json new.json --threshold 2.0

Accepts either the driver's record shape ({"parsed": {...}}) or the raw
bench.py JSON line.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys


def load(path: str) -> dict:
    with open(path) as fh:
        text = fh.read()
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        # driver tail logs: find the JSON line
        line = next(
            ln for ln in text.splitlines() if ln.startswith('{"metric"')
        )
        d = json.loads(line)
    return d.get("parsed", d)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=2.0)
    args = ap.parse_args()
    old, new = load(args.old), load(args.new)
    flagged = 0
    for key in ("queries", "ext", "ext2"):
        o, n = old.get(key) or {}, new.get(key) or {}
        shared = sorted(set(o) & set(n))
        if not shared:
            continue
        ratios = {q: n[q] / o[q] for q in shared if o[q] > 0}
        med = statistics.median(ratios.values())
        print(f"[{key}] {len(shared)} shared queries, median ratio {med:.2f}x")
        for q, r in sorted(ratios.items(), key=lambda kv: -kv[1]):
            # drift relative to the suite's own boot-to-boot shift
            rel = r / med if med > 0 else float("inf")
            mark = "  <-- FLAG" if rel >= args.threshold else ""
            if mark or rel >= 1.5:
                print(
                    f"  {q}: {o[q]:.3f}s -> {n[q]:.3f}s "
                    f"({r:.2f}x raw, {rel:.2f}x vs suite median){mark}"
                )
            flagged += bool(mark)
    print(f"\n{flagged} flagged (>= {args.threshold}x vs suite median)")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
