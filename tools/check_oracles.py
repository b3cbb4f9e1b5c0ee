#!/usr/bin/env python3
"""Driver-emulating DuckDB oracle cross-check.

Usage: python3 tools/check_oracles.py [verify_out_dir] [sf_dir]

For each entry in <verify_out_dir>/oracle_sql.json: register the sf_dir
parquet tables as DuckDB views, run the oracle SQL, and compare against the
Spark query's parquet dump (columns sorted by name, rows sorted, exact string
compare) — the same contract the driver's CORRECTNESS gate applies.
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

with open(os.path.join(out_dir, "oracle_sql.json")) as fh:
    oracles = json.load(fh)

def canon(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(df.astype(str).values.tolist())
    return "\n".join("\x1f".join(r) for r in rows)

failures = 0
for name in sorted(os.listdir(out_dir)):
    qdir = os.path.join(out_dir, name)
    if not os.path.isdir(qdir):
        continue
    spark_df = pd.concat(
        [pd.read_parquet(f) for f in glob.glob(os.path.join(qdir, "*.parquet"))],
        ignore_index=True)
    if name not in oracles:
        print(f"NO_ORACLE {name} rows={len(spark_df)}")
        failures += 1
        continue
    try:
        oracle_df = con.execute(oracles[name]).df()
    except Exception as e:
        print(f"ORACLE_ERR {name}: {e}")
        failures += 1
        continue
    rows_ok = len(spark_df) == len(oracle_df)
    cols_ok = sorted(spark_df.columns) == sorted(oracle_df.columns)
    hash_ok = cols_ok and canon(spark_df) == canon(oracle_df)
    status = "MATCH" if (rows_ok and cols_ok and hash_ok) else "MISMATCH"
    if status != "MATCH":
        failures += 1
    print(f"{status} {name} spark_rows={len(spark_df)} oracle_rows={len(oracle_df)} "
          f"cols_ok={cols_ok} hash_ok={hash_ok}")
    if status == "MISMATCH" and cols_ok:
        a, b = canon(spark_df).split("\n"), canon(oracle_df).split("\n")
        for i, (x, y) in enumerate(zip(a, b)):
            if x != y:
                print(f"  first diff row {i}:\n    spark : {x[:300]}\n    oracle: {y[:300]}")
                break

print(f"\n{len(oracles)} oracles, {failures} problems")
sys.exit(1 if failures else 0)
