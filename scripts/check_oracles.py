#!/usr/bin/env python3
"""Local pre-validation of the driver's correctness gate.

Runs graft.Verify output (one parquet dir per query + oracle_sql.json)
against DuckDB on the same testdata tables, mimicking the driver's compare:
sort columns by name, sort rows, compare values.

Usage: python3 scripts/check_oracles.py <sfDir> <verifyOutDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    # driver-like canonicalization: columns sorted by name, rows sorted
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def values_equal(a, b):
    if a is b:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            got = canon(con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        except Exception as e:
            print(f"FAIL {name}: spark output missing/unreadable: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if got.dtypes.tolist() != want.dtypes.tolist():
            print(f"WARN {name}: dtypes {got.dtypes.tolist()} != {want.dtypes.tolist()}")
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        mismatch = None
        for col in got.columns:
            gv, wv = got[col].tolist(), want[col].tolist()
            for i, (g, w) in enumerate(zip(gv, wv)):
                if not values_equal(g, w):
                    mismatch = (col, i, g, w)
                    break
            if mismatch:
                break
        if mismatch:
            col, i, g, w = mismatch
            print(f"FAIL {name}: {col}[{i}] spark={g!r} duckdb={w!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
