#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

DEV HARNESS ONLY — not part of the Scala library. Mimics the driver:
runs each oracle SQL from <outdir>/oracle_sql.json in DuckDB over the
sf parquet tables, loads the Spark result parquet from <outdir>/<name>/,
sorts columns by name, sorts rows, and compares values exactly.

Usage: python3 tools/precheck.py <sfdir> <outdir> [query ...]
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # ns -> us so Spark (us) and DuckDB (us) timestamps compare equal
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if str(df[c].dtype) == "object":
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main() -> int:
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            expect = canon(con.sql(sql).df())
            con2 = duckdb.connect()
            got = canon(con2.sql(
                f"SELECT * FROM '{outdir}/{name}/*.parquet'").df())
            con2.close()
        except Exception as e:
            print(f"FAIL {name}: load error: {e}")
            n_fail += 1
            continue
        if list(expect.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(expect.columns)}")
            n_fail += 1
            continue
        if len(expect) != len(got):
            print(f"FAIL {name}: rows {len(got)} != {len(expect)}")
            n_fail += 1
            continue
        schema_got = [str(t) for t in got.dtypes]
        schema_exp = [str(t) for t in expect.dtypes]
        if schema_got != schema_exp:
            print(f"WARN {name}: dtypes {schema_got} != {schema_exp}")
        try:
            pd.testing.assert_frame_equal(
                got, expect, check_dtype=False, check_exact=True)
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: {str(e)[:500]}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
