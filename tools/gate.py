#!/usr/bin/env python3
"""Snapshot gate: the registration-sync invariants that rounds 7 and 8
both broke with last-turn additions (dev tool only).

Asserts, from the committed sources alone (no Spark session):
  1. SURVEY.md section-2 query names  ==  SparkEntry.queries keys
     (section-2 `- [x]` entries whose backticked name is a query;
     INFRA items have no query name and are skipped)
  2. Bench.headline                   is a subset of  SparkEntry.queries
  3. SparkEntry.oracleSql keys        is a subset of  SparkEntry.queries
  4. Artifact freshness (round 10, the r9 judge's ask #5):
     BENCH_DETAIL.json / BENCH_sf1.json must not differ from HEAD, and
     no tracked-artifact-class file (BENCH_*.json, CORRECTNESS_*.json,
     LEAKCHECK.json, STREAM_BENCH.json, SCALE_PROBE.md) may sit
     untracked or modified in the working tree at snapshot time.

Run before every end-of-round snapshot commit:
    python3 tools/gate.py            # exits non-zero on any drift
    python3 tools/gate.py --no-git   # registration checks only
"""
import re
import subprocess
import sys
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def survey_names():
    txt = open(os.path.join(ROOT, "SURVEY.md")).read()
    sec2 = txt.split("## §2", 1)[1].split("\n## ", 1)[0]
    names = set()
    # entries span multiple lines; an entry starts with "- [x] "
    for entry in re.split(r"\n(?=- \[)", sec2):
        if not entry.startswith("- [x]"):
            continue
        head = entry[len("- [x]"):].lstrip()
        if head.startswith("INFRA"):
            continue
        # an entry may name several queries: `a` / `b` — take every
        # backticked name before the first em-dash separator
        m = re.match(r"((?:`[^`]+`(?:\s*/\s*)?)+)", head)
        if m:
            names.update(re.findall(r"`([^`]+)`", m.group(1)))
    return names


def scala_keys(path, anchor):
    """Collect "name" -> string keys from the map/seq literal after anchor."""
    txt = open(os.path.join(ROOT, path)).read()
    after = txt.split(anchor, 1)[1]
    # skip the signature/type: balance from the literal's own opening
    m = re.search(r"=\s*(?:Map|Seq)\s*\(", after)
    body = after[m.end() - 1:]
    depth, end = 0, len(body)
    for i, c in enumerate(body):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                end = i
                break
    body = body[:end] + ")"
    # any string literal in key position (followed by -> , or the
    # closing paren) — NOT just [a-z0-9_]+, so an unconventional key
    # can't silently vanish from both sides of every comparison
    keys = set(re.findall(r'"((?:[^"\\]|\\.)+)"\s*(?:->|,|\))', body))
    # parse-shortfall guard: every key-position literal must have been
    # captured; a shortfall means the regex missed something — fail
    # loudly instead of comparing incomplete sets
    n_key_pos = len(re.findall(r'"(?:[^"\\]|\\.)+"\s*(?:->|,|\))', body))
    if n_key_pos != len(keys):
        print(f"GATE FAIL: {path} {anchor}: extracted {len(keys)} distinct "
              f"keys from {n_key_pos} key-position literals — duplicate or "
              f"unparseable key in the map body")
        sys.exit(1)
    return keys


def git(*args):
    return subprocess.run(["git", *args], cwd=ROOT, capture_output=True,
                          text=True).stdout


ARTIFACT_RE = re.compile(
    r"^(BENCH_[A-Za-z0-9_.]+\.json|CORRECTNESS_r\d+\.json|LEAKCHECK\.json|"
    r"STREAM_BENCH[A-Za-z0-9_]*\.json|SCALE_PROBE\.md)$")


def artifact_freshness():
    """The r9 'uncommitted artifact drift' class: fail when a bench or
    correctness artifact differs from HEAD or sits untracked."""
    bad = False
    status = git("status", "--porcelain")
    for line in status.splitlines():
        st, path = line[:2], line[3:].strip()
        if ARTIFACT_RE.match(os.path.basename(path)) and "/" not in path:
            kind = "untracked" if st == "??" else "modified vs HEAD"
            print(f"GATE FAIL: artifact drift — {path} is {kind}; "
                  f"commit the refreshed artifact with the snapshot")
            bad = True
    return bad


def main():
    survey = survey_names()
    queries = scala_keys("src/main/scala/graft/SparkEntry.scala",
                         "def queries")
    oracles = scala_keys("src/main/scala/graft/SparkEntry.scala",
                         "def oracleSql")
    headline = scala_keys("src/main/scala/graft/Bench.scala",
                          "val headline")

    bad = False
    d1 = survey - queries
    d2 = queries - survey
    if d1:
        print(f"GATE FAIL: in SURVEY section 2 but not SparkEntry.queries: {sorted(d1)}")
        bad = True
    if d2:
        print(f"GATE FAIL: registered query missing its SURVEY section-2 entry: {sorted(d2)}")
        bad = True
    d3 = headline - queries
    if d3:
        print(f"GATE FAIL: bench headline names not registered: {sorted(d3)}")
        bad = True
    d4 = oracles - queries
    if d4:
        print(f"GATE FAIL: oracleSql key without a queries entry: {sorted(d4)}")
        bad = True
    if "--no-git" not in sys.argv:
        bad = artifact_freshness() or bad
    if bad:
        sys.exit(1)
    print(f"GATE OK: {len(queries)} queries == {len(survey)} section-2 names; "
          f"headline {len(headline)} and oracles {len(oracles)} all registered; "
          f"artifacts clean")


if __name__ == "__main__":
    main()
