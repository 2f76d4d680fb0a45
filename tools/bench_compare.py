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
  python tools/bench_compare.py OLD NEW [-n K_OLD] [-m K_NEW]

Prints the common-query count, sums, the MEDIAN per-query ratio (the
drift-robust signal), the calibration-normalized total when both readings
carry a calibration probe, and the top movers in both directions. The
round-9 calibration rules are encoded, not left to NOTES discipline:
within a host class back-to-back, total/cal is stable; across hosts or
hours, the CPU/shuffle probe can ANTI-correlate with per-query time — so
when the cal-ratio and the median per-query ratio disagree by >10% the
tool prints a loud warning and tells you to trust the median.
"""

from __future__ import annotations

import argparse
import json
import re
import statistics


def _load(path: str, nth_last: int = 1) -> tuple[dict[str, float], float | None, float | None]:
    """Return (queries, calibration_s, sf) from any supported artifact shape."""
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
        cal = qs.pop("calibration_s", None)
        sf = qs.pop("sf", None)
        qs.pop("value", None)
        return qs, cal, sf
    if isinstance(obj, dict) and "queries" in obj:
        return (
            {k: float(v) for k, v in obj["queries"].items()},
            obj.get("calibration_s"),
            obj.get("sf"),
        )
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
    d = hits[-nth_last]
    return (
        {k: float(v) for k, v in d["queries"].items()},
        d.get("calibration_s"),
        d.get("sf"),
    )


def main() -> None:
    ap = argparse.ArgumentParser(
        description="Per-query bench comparison (drift-robust median ratio)."
    )
    ap.add_argument("old", help="older reading (BENCHLOG.jsonl / bench JSON / BENCH_rN.json)")
    ap.add_argument("new", help="newer reading")
    ap.add_argument("-n", type=int, default=1, metavar="K_OLD",
                    help="use the K-th last JSONL line for OLD (default 1)")
    ap.add_argument("-m", type=int, default=1, metavar="K_NEW",
                    help="use the K-th last JSONL line for NEW (default 1)")
    ns = ap.parse_args()
    (old, cal_old, sf_old), (new, cal_new, sf_new) = (
        _load(ns.old, ns.n),
        _load(ns.new, ns.m),
    )
    if sf_old is not None and sf_new is not None and sf_old != sf_new:
        # BENCHLOG interleaves sanity runs at small SFs with the real sf0.1
        # readings — a cross-SF "comparison" is meaningless and the ratios
        # look like a catastrophic regression. Refuse; -n/-m select lines.
        raise SystemExit(
            f"sf mismatch: OLD is sf{sf_old}, NEW is sf{sf_new} — pick "
            "same-SF lines with -n/-m (BENCHLOG mixes sanity-run SFs)"
        )
    common = sorted(set(old) & set(new))
    if not common:
        raise SystemExit("no common queries between the two readings")
    ratios = {q: new[q] / old[q] for q in common if old[q] > 0}
    med = statistics.median(ratios.values())
    sum_old = sum(old[q] for q in common)
    sum_new = sum(new[q] for q in common)
    print(
        f"{len(common)} common queries | sum old={sum_old:.1f}s"
        f" new={sum_new:.1f}s | MEDIAN ratio={med:.3f}"
        f" (board-wide drift estimate)"
    )
    if cal_old and cal_new:
        cal_ratio = cal_new / cal_old
        print(
            f"calibration {cal_old:.3f}s -> {cal_new:.3f}s (ratio {cal_ratio:.3f})"
            f" | cal-normalized total ratio ="
            f" {(sum_new / sum_old) / cal_ratio:.3f}"
        )
        # The r9 anti-correlation signature: the CPU/shuffle probe and the
        # per-query medians disagree — I/O/session-side drift the probe
        # cannot see, or a cross-host comparison. Median governs.
        if med > 0 and abs(cal_ratio / med - 1.0) > 0.10:
            print(
                "WARNING: calibration ratio and median per-query ratio "
                f"disagree by {abs(cal_ratio / med - 1.0):.0%} — the probe "
                "is not tracking this drift (cross-host or long-horizon "
                "reading). Trust the MEDIAN per-query ratio; do not "
                "cal-normalize totals across these two readings."
            )
    else:
        print("(no calibration probe on one/both readings — per-query medians only)")
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
