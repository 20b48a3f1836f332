#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only; the
shipped Scala library does not depend on this).

Usage: python3 tools/check.py [sfDir] [outDir]
  1. expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have run
  2. loads each <outDir>/<name> parquet (Spark result)
  3. runs <outDir>/oracle_sql.json's SQL in DuckDB over sfDir parquet
  4. compares: schema (sorted col names), row count, and values
     (columns sorted by name, rows sorted, exact + 1e-9 tolerance)
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    res_dir = f"{out}/{name}"
    if not os.path.isdir(res_dir):
        print(f"FAIL {name}: no spark result dir"); fails += 1; continue
    files = glob.glob(f"{res_dir}/*.parquet")
    spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    try:
        duck_df = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {e}"); fails += 1; continue

    s_cols, d_cols = sorted(spark_df.columns), sorted(duck_df.columns)
    if s_cols != d_cols:
        print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}"); fails += 1; continue
    if len(spark_df) != len(duck_df):
        print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}"); fails += 1; continue

    s = spark_df[s_cols].copy()
    d = duck_df[d_cols].copy()

    # Driver parity: the driver hash-compares TYPED values, so an int64
    # Spark column vs a float64 oracle column (e.g. DuckDB sum(INTEGER)
    # -> HUGEINT -> float64) must FAIL here too, even if values match.
    def kind(dt):
        st = str(dt)
        if st.startswith("datetime"): return "datetime"
        if st == "bool": return "bool"
        if st == "object": return "object"
        if "int" in st: return "int"
        if "float" in st: return "float"
        return st
    dtype_ok = True
    for c in s_cols:
        ks, kd = kind(s[c].dtype), kind(d[c].dtype)
        if ks != kd:
            print(f"FAIL {name}: dtype col {c} spark={s[c].dtype}({ks}) duck={d[c].dtype}({kd})")
            fails += 1; dtype_ok = False; break
    if not dtype_ok:
        continue

    for c in s_cols:  # normalize: decimals->float, ts->str, bytes->hex
        for df in (s, d):
            if df[c].dtype == object:
                df[c] = df[c].map(lambda v: v.hex() if isinstance(v, (bytes, bytearray))
                                  else str(v))
            elif str(df[c].dtype).startswith("datetime"):
                df[c] = df[c].astype("datetime64[us]").astype(str)
            else:
                try: df[c] = df[c].astype(float)
                except (ValueError, TypeError): df[c] = df[c].astype(str)
    s = s.sort_values(s_cols).reset_index(drop=True)
    d = d.sort_values(d_cols).reset_index(drop=True)
    ok, detail = True, ""
    for c in s_cols:
        if s[c].dtype == float:
            exact = np.allclose(s[c], d[c], rtol=0, atol=0, equal_nan=True)
            close = np.allclose(s[c], d[c], rtol=1e-9, atol=1e-9, equal_nan=True)
            if not exact:
                ok = False
                detail = f"col {c} {'CLOSE-BUT-NOT-EXACT' if close else 'DIFFERS'}"
                bad = np.where(~np.isclose(s[c], d[c], rtol=0, atol=0, equal_nan=True))[0][:3]
                detail += f" rows {bad.tolist()} spark={s[c].iloc[bad].tolist()} duck={d[c].iloc[bad].tolist()}"
                break
        else:
            if not (s[c] == d[c]).all():
                ok = False
                bad = np.where(s[c] != d[c])[0][:3]
                detail = f"col {c} rows {bad.tolist()} spark={s[c].iloc[bad].tolist()} duck={d[c].iloc[bad].tolist()}"
                break
    if ok:
        print(f"PASS {name} ({len(s)} rows)")
    else:
        print(f"FAIL {name}: {detail}"); fails += 1

print(f"\n{len(oracle) - fails}/{len(oracle)} passed")
sys.exit(1 if fails else 0)
