#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle gate.

Usage: python3 scripts/check_correctness.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify, runs the oracle SQL from
oracle_sql.json in DuckDB over the same parquet tables, sorts columns by
name, and compares values cell-by-cell (exact for ints/strings, exact
after repr for floats — the driver hashes, so near enough is not enough).
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        return repr(round(v, 9))
    if v is None:
        return "NULL"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def frame_rows(df):
    df = df[sorted(df.columns)]
    return [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False)]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        spark_df = pd.read_parquet(qdir)
        if name not in oracles:
            print(f"{name}: NO-ORACLE rows={len(spark_df)}")
            continue
        try:
            oracle_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE-SQL-ERROR {str(e)[:200]}")
            n_fail += 1
            continue
        s_cols, o_cols = sorted(spark_df.columns), sorted(oracle_df.columns)
        if s_cols != o_cols:
            print(f"{name}: SCHEMA-MISMATCH spark={s_cols} oracle={o_cols}")
            n_fail += 1
            continue
        s_rows, o_rows = frame_rows(spark_df), frame_rows(oracle_df)
        if len(s_rows) != len(o_rows):
            print(f"{name}: ROWCOUNT-MISMATCH spark={len(s_rows)} oracle={len(o_rows)}")
            n_fail += 1
            continue
        if s_rows == o_rows:
            print(f"{name}: MATCH rows={len(s_rows)}")
            n_pass += 1
        elif sorted(s_rows) == sorted(o_rows):
            print(f"{name}: ORDER-ONLY-MISMATCH rows={len(s_rows)}")
            n_fail += 1
        else:
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b][:3]
            print(f"{name}: VALUE-MISMATCH rows={len(s_rows)} cols={s_cols}")
            for i, a, b in bad:
                print(f"    row {i}: spark={a}")
                print(f"    row {i}: oracle={b}")
            n_fail += 1
    # a query whose Verify dump is MISSING failed at dump time (the
    # exception went to Verify's stderr) — it must not silently vanish
    # from the tally
    for name in sorted(oracles):
        if not os.path.isdir(os.path.join(out_dir, name)):
            print(f"{name}: MISSING-DUMP (query failed during Verify)")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
