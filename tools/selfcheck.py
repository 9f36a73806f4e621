#!/usr/bin/env python3
"""Local pre-flight for the driver's t2 gate: run DuckDB on
outDir/oracle_sql.json against the sfDir parquet tables and compare with
the Spark outputs Verify wrote to outDir/<name>/*.parquet.

Usage: python3 tools/selfcheck.py <sfDir> <outDir>
"""
import glob
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}")
            n_bad += 1
            continue
        got = con.sql(
            "SELECT * FROM read_parquet([" +
            ",".join(f"'{f}'" for f in files) + "])").df()
        # driver semantics: sort columns by name, then compare values
        exp = exp.reindex(sorted(exp.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        problems = []
        if list(exp.columns) != list(got.columns):
            problems.append(f"cols exp={list(exp.columns)} got={list(got.columns)}")
        elif len(exp) != len(got):
            problems.append(f"rows exp={len(exp)} got={len(got)}")
        else:
            if list(exp.dtypes) != list(got.dtypes):
                problems.append(f"dtypes exp={list(exp.dtypes)} got={list(got.dtypes)}")
            for c in exp.columns:
                ev, gv = list(exp[c]), list(got[c])
                for i, (a, b) in enumerate(zip(ev, gv)):
                    a, b = norm(a), norm(b)
                    if a != b and str(a) != str(b):
                        problems.append(f"col {c} row {i}: exp={a!r} got={b!r}")
                        break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:4]))
            n_bad += 1
        else:
            print(f"ok   {name} ({len(exp)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
