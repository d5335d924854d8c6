#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`, run
    python3 scripts/verify_local.py <sfDir> <outDir>

For each query parquet in <outDir>, runs the matching oracle SQL from
oracle_sql.json in DuckDB (tables registered as views over <sfDir>),
sorts columns by name, and compares row-by-row. Reports per-query
match/mismatch with first diffs.
"""
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    # let heavy oracle CTEs (doc_pipeline_e2e) spill instead of dying
    # with an intermittent "Out of Memory Error: Failed to allocate" —
    # observed ~1-in-6 runs on a loaded box, a harness flake that reads
    # exactly like a correctness failure in the summary line
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as fh:
        oracles = json.load(fh)

    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        spark_df = con.sql(f"SELECT * FROM '{d}/*.parquet'").df()
        if name not in oracles:
            results[name] = f"NO-ORACLE rows={len(spark_df)}"
            continue
        try:
            oracle_df = con.sql(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE-SQL-ERROR {e}"
            continue
        spark_df = spark_df[sorted(spark_df.columns)]
        oracle_df = oracle_df[sorted(oracle_df.columns)]
        if list(spark_df.columns) != list(oracle_df.columns):
            results[name] = (f"SCHEMA-MISMATCH spark={list(spark_df.columns)} "
                             f"oracle={list(oracle_df.columns)}")
            continue
        if len(spark_df) != len(oracle_df):
            results[name] = f"ROWCOUNT spark={len(spark_df)} oracle={len(oracle_df)}"
            continue
        mismatch = None
        for c in spark_df.columns:
            a, b = spark_df[c], oracle_df[c]
            try:
                eq = (a == b) | (a.isna() & b.isna())
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                i = int((~eq).idxmax())
                mismatch = f"COL {c} row {i}: spark={a[i]!r} oracle={b[i]!r}"
                break
        results[name] = mismatch or f"OK rows={len(spark_df)}"

    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    n_no = sum(1 for v in results.values() if v.startswith("NO-ORACLE"))
    for k, v in sorted(results.items()):
        print(f"  {k}: {v}")
    print(f"== {n_ok} OK, {n_no} no-oracle, "
          f"{len(results) - n_ok - n_no} FAILED of {len(results)}")
    return 0 if n_ok + n_no == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
