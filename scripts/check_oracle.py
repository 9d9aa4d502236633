#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate.

Runs AFTER `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query result parquet in <outDir>, runs the matching oracle SQL
from oracle_sql.json in DuckDB over the same sf tables, sorts columns by
name, and compares schema + values hash.

Usage: python scripts/check_oracle.py <sfDir> <outDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = 0
for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
    name = os.path.basename(qdir)
    if not os.path.isdir(qdir):
        continue
    spark_df = con.execute(
        f"SELECT * FROM '{qdir}/*.parquet'").fetchdf()
    if name not in oracle:
        print(f"  [rows-only] {name}: {len(spark_df)} rows")
        continue
    try:
        oracle_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"✗ {name}: oracle SQL failed: {e}")
        fails += 1
        continue
    a, b = normalize(spark_df), normalize(oracle_df)
    if list(a.columns) != list(b.columns):
        print(f"✗ {name}: column mismatch {list(a.columns)} vs {list(b.columns)}")
        fails += 1
        continue
    if len(a) != len(b):
        print(f"✗ {name}: row count {len(a)} vs {len(b)}")
        fails += 1
        continue
    def kind(dt: str) -> str:
        # the driver's hasher accepts integer-width drift (int32 vs int64,
        # r4 p_parquet_blob was green with it) but NOT kind drift — a
        # decimal128 parquet column vs a float64 oracle fetch hash-differs
        # even when every value is equal (r4 p_cdc_apply shipped red
        # exactly because this check was lenient)
        if dt.startswith(("int", "uint")): return "int"
        if dt.startswith("float"): return "float"
        if dt.startswith("datetime"): return "datetime"
        return dt
    sa = [str(ai.dtype) for _, ai in a.items()]
    sb = [str(bi.dtype) for _, bi in b.items()]
    if [kind(x) for x in sa] != [kind(x) for x in sb]:
        print(f"✗ {name}: dtype kind mismatch {sa} vs {sb} (driver hasher would fail this)")
        fails += 1
        continue
    if sa != sb:
        print(f"! {name}: integer-width drift {sa} vs {sb} (driver hasher accepts)")
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
        print(f"✓ {name}: {len(a)} rows exact-match")
    except AssertionError as e:
        print(f"✗ {name}: VALUE MISMATCH\n{str(e)[:500]}")
        fails += 1

sys.exit(1 if fails else 0)
