#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir>

Loads each <name>.parquet produced by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sf_dir tables, and
compares row count, schema (column names), and a hash of the values with
columns sorted by name and rows sorted by all columns.
"""
import json, sys, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def h(df: pd.DataFrame) -> str:
    # stringify everything; round-trip floats through repr for stability
    buf = df.astype(str).to_csv(index=False).encode()
    return hashlib.sha256(buf).hexdigest()[:16]


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            mine = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            failures += 1
            continue
        try:
            ref = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        a, b = canon(mine), canon(ref)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            failures += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            failures += 1
            continue
        if h(a) != h(b):
            print(f"FAIL {name}: hash mismatch")
            diff = (a.astype(str) != b.astype(str))
            bad = diff.any(axis=1)
            print(pd.concat([a[bad].head(5), b[bad].head(5)], keys=["spark", "duck"]))
            failures += 1
            continue
        print(f"OK   {name} ({len(a)} rows)")
    print(f"{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
