#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]

Reads each `<outDir>/<name>` parquet dir (written by graft.Verify), runs
the matching oracle SQL from `<outDir>/oracle_sql.json` in DuckDB with the
sf tables registered as views, and compares: row count, sorted column
names, and cell values (rows sorted by all columns). Exits nonzero on any
mismatch. This is a dev tool only — the shipped Scala library never
depends on it.
"""
import json
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(con, rel_sql):
    df = con.sql(rel_sql).fetchdf()
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            got = canon(con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            want = canon(con, sql)
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: exception {str(e)[:300]}")
            continue
        if list(got.columns) != list(want.columns):
            failures.append(name)
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            continue
        if len(got) != len(want):
            failures.append(name)
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            continue
        neq = (got.astype(str) != want.astype(str))
        if neq.any().any():
            failures.append(name)
            bad_cols = [c for c in got.columns if neq[c].any()]
            print(f"FAIL {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:2]:
                idx = neq[c].idxmax()
                print(f"  first diff col={c} row={idx}: got={got[c][idx]!r} want={want[c][idx]!r}")
        else:
            print(f"OK   {name} ({len(got)} rows)")
    if failures:
        print(f"\n{len(failures)} FAILED: {failures}")
        sys.exit(1)
    print("\nall green")


if __name__ == "__main__":
    main()
