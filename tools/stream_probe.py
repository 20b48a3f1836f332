#!/usr/bin/env python3
"""Streaming sf1/sf0.1 scaling table from two STREAM_BENCH-format files.

Usage: stream_probe.py <stream_sf01.json> <stream_sf1.json> [flag_ratio]

Prints a markdown table (worst time-ratio first) with per-query wall
seconds, end-to-end input rows/sec, and MAX STATE ROWS at both SFs —
the state column is the 100 TB credibility check: a stateful operator
whose state grows linearly with input (rather than with keys/windows
still open under the watermark) would OOM a real cluster long before
throughput became the problem.

A query is flagged when its sf1/sf0.1 time ratio exceeds flag_ratio
(default 13, the batch probe's bar). Sub-1s sf0.1 times are
overhead-dominated; flagged only if the sf1 absolute time exceeds 10s.
"""
import json
import sys


def main():
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    flag_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 13.0
    rows = []
    for q, m0 in a["queries"].items():
        m1 = b["queries"].get(q)
        if m1 is None:
            rows.append((float("inf"), q, m0, None, "MISSING/ERROR"))
            continue
        r = m1["sec"] / m0["sec"] if m0["sec"] > 0 else float("inf")
        overhead = m0["sec"] < 1.0
        flagged = r > flag_ratio and (not overhead or m1["sec"] > 10.0)
        note = "FLAG" if flagged else ("overhead-dom" if overhead else "")
        rows.append((r, q, m0, m1, note))
    rows.sort(key=lambda x: -x[0])
    print("| query | sf0.1 s | sf1 s | ratio | rows/s sf0.1 | rows/s sf1 "
          "| state sf0.1 | state sf1 | state ratio | note |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for r, q, m0, m1, note in rows:
        if m1 is None:
            print(f"| {q} | {m0['sec']:.2f} | - | n/a | - | - | - | - | - | {note} |")
            continue
        s0, s1 = m0["max_state_rows"], m1["max_state_rows"]
        sr = f"{s1 / s0:.1f}" if s0 > 0 else ("0" if s1 == 0 else "new")
        print(f"| {q} | {m0['sec']:.2f} | {m1['sec']:.2f} | {r:.1f} "
              f"| {m0['rows_per_sec']} | {m1['rows_per_sec']} "
              f"| {s0} | {s1} | {sr} | {note} |")
    flags = [x for x in rows if x[4] in ("FLAG", "MISSING/ERROR")]
    print(f"\nstream totals: sf0.1 {a['value']:.1f}s (steal {a['steal_pct']}%), "
          f"sf1 {b['value']:.1f}s (steal {b['steal_pct']}%), "
          f"total ratio {b['value'] / a['value']:.1f}, "
          f"flagged {len(flags)}: {[x[1] for x in flags]}")


if __name__ == "__main__":
    main()
