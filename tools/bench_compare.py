#!/usr/bin/env python
"""Compare two bench readings per-query: the drift analysis the round-9
calibration study showed must be done per-query, not by total/calibration
ratio (the 60 M probe tracks CPU/shuffle throughput, which diverges from
the session/IO costs that dominate sub-second sf0.1 queries — NOTES.md
round 9 item 2).

Inputs may be, in any combination:
  - a BENCHLOG.jsonl path (uses the LAST line, or -n K for the K-th last);
  - a full bench JSON line in a file (e.g. /tmp/bench.json);
  - a driver BENCH_rN.json artifact (the truncated-tail wrapper — queries
    are recovered from the escaped tail string).

Usage:
  python tools/bench_compare.py OLD NEW [-n K_old] [-m K_new]

Prints the common-query count, sums, the MEDIAN per-query ratio (the
drift-robust signal), and the top movers in both directions.
"""

from __future__ import annotations

import json
import re
import statistics
import sys


def _load(path: str, nth_last: int = 1) -> dict[str, float]:
    text = open(path).read()
    # Driver artifact: {"n": .., "tail": "...escaped json..."}
    try:
        obj = json.loads(text)
    except json.JSONDecodeError:
        obj = None
    if isinstance(obj, dict) and "tail" in obj and "queries" not in obj:
        qs = {
            k: float(v)
            for k, v in re.findall(r'"([a-z_0-9]+)":\s*([0-9.]+)', obj["tail"])
        }
        for meta in ("sf", "calibration_s", "value"):
            qs.pop(meta, None)
        return qs
    if isinstance(obj, dict) and "queries" in obj:
        return {k: float(v) for k, v in obj["queries"].items()}
    # JSONL: pick the K-th last parseable line with a queries dict.
    lines = [ln for ln in text.splitlines() if ln.strip()]
    hits = []
    for ln in lines:
        try:
            d = json.loads(ln)
        except json.JSONDecodeError:
            continue
        if isinstance(d, dict) and "queries" in d:
            hits.append(d)
    if not hits or nth_last > len(hits):
        raise SystemExit(f"no bench line with queries found in {path}")
    return {k: float(v) for k, v in hits[-nth_last]["queries"].items()}


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    flags = sys.argv[1:]
    n_old = int(flags[flags.index("-n") + 1]) if "-n" in flags else 1
    n_new = int(flags[flags.index("-m") + 1]) if "-m" in flags else 1
    if len(args) != 2:
        raise SystemExit(__doc__)
    old, new = _load(args[0], n_old), _load(args[1], n_new)
    common = sorted(set(old) & set(new))
    if not common:
        raise SystemExit("no common queries between the two readings")
    ratios = {q: new[q] / old[q] for q in common if old[q] > 0}
    med = statistics.median(ratios.values())
    print(
        f"{len(common)} common queries | sum old={sum(old[q] for q in common):.1f}s"
        f" new={sum(new[q] for q in common):.1f}s | MEDIAN ratio={med:.3f}"
        f" (board-wide drift estimate)"
    )
    print("\nregressions (ratio desc, drift-normalized > 1.2x shown):")
    for q in sorted(ratios, key=lambda q: -ratios[q]):
        if ratios[q] / med <= 1.2:
            break
        print(f"  {q:34s} {old[q]:7.2f} -> {new[q]:7.2f}  {ratios[q]:.2f}x"
              f"  ({ratios[q]/med:.2f}x vs board)")
    print("\nimprovements (drift-normalized < 0.8x shown):")
    for q in sorted(ratios, key=lambda q: ratios[q]):
        if ratios[q] / med >= 0.8:
            break
        print(f"  {q:34s} {old[q]:7.2f} -> {new[q]:7.2f}  {ratios[q]:.2f}x"
              f"  ({ratios[q]/med:.2f}x vs board)")


if __name__ == "__main__":
    main()
