#!/usr/bin/env python3
"""Dev-side oracle replay: compare Verify output parquet against DuckDB
running the same oracle SQL over the testdata parquet tables.

Usage: python3 tools/check_local.py <sfDir> <verifyOutDir> [query ...]

Mirrors the driver's compare shape: sort columns by name, sort rows,
compare row counts, schemas (column names), and values (floats rounded
to 9dp before compare). Not the driver itself — a fast local gate.
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings", "partsupp"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    bad = []
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        spark_files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not spark_files:
            bad.append((name, "no spark output"))
            continue
        try:
            o = con.execute(sql).fetchdf()
        except Exception as e:
            bad.append((name, f"oracle error: {e}"))
            continue
        s = duckdb.connect().execute(
            f"SELECT * FROM read_parquet({spark_files!r})").fetchdf()
        so = s[sorted(s.columns)]
        oo = o[sorted(o.columns)]
        if list(so.columns) != list(oo.columns):
            bad.append((name, f"schema {list(so.columns)} vs {list(oo.columns)}"))
            continue
        if len(so) != len(oo):
            bad.append((name, f"rows {len(so)} vs {len(oo)}"))
            continue

        def norm(df):
            df = df.copy()
            for c in df.columns:
                if df[c].dtype.kind == "f":
                    df[c] = df[c].round(9)
            return df.sort_values(by=list(df.columns)).reset_index(drop=True)

        a, b = norm(so), norm(oo)
        if not a.equals(b):
            diff_cols = [c for c in a.columns if not a[c].equals(b[c])]
            bad.append((name, f"values differ in {diff_cols}"))
            continue
        print(f"  ok   {name} ({len(so)} rows)")
    for name, why in bad:
        print(f"  FAIL {name}: {why}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
