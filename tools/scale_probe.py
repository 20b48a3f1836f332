#!/usr/bin/env python3
"""sf1/sf0.1 scaling-exponent table from two BENCH_DETAIL-format files.

Usage: scale_probe.py <detail_sf01.json> <detail_sf1.json> [flag_ratio]

Prints a markdown table sorted by ratio (worst first) and a summary.
A query is flagged when its sf1/sf0.1 ratio exceeds flag_ratio
(default 13: 10x data on 32 already-saturated cores plus sort slack).
Sub-0.3s sf0.1 times are overhead-dominated; their ratios are reported
but flagged only if the sf1 ABSOLUTE time also exceeds 3s.
"""
import json
import sys


def main():
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    flag_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 13.0
    rows = []
    for q, t0 in a["queries"].items():
        t1 = b["queries"].get(q)
        if t1 is None or t0 <= 0 or t1 <= 0:
            rows.append((float("inf"), q, t0, t1, "MISSING/ERROR"))
            continue
        r = t1 / t0
        overhead = t0 < 0.3
        flagged = (r > flag_ratio and (not overhead or t1 > 3.0))
        note = "FLAG" if flagged else ("overhead-dom" if overhead else "")
        rows.append((r, q, t0, t1, note))
    rows.sort(reverse=True)
    print("| query | sf0.1 s | sf1 s | ratio | note |")
    print("|---|---|---|---|---|")
    for r, q, t0, t1, note in rows:
        rs = "n/a" if r == float("inf") else f"{r:.1f}"
        t1s = "-" if t1 is None else f"{t1:.2f}"
        print(f"| {q} | {t0:.2f} | {t1s} | {rs} | {note} |")
    flags = [x for x in rows if x[4] in ("FLAG", "MISSING/ERROR")]
    print(f"\ntotal sf0.1 {a['value']:.1f}s (steal {a['steal_pct']}%), "
          f"sf1 {b['value']:.1f}s (steal {b['steal_pct']}%), "
          f"total ratio {b['value'] / a['value']:.1f}, "
          f"flagged {len(flags)}: {[x[1] for x in flags]}")


if __name__ == "__main__":
    main()
