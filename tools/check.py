#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle SQL in
DuckDB over the testdata parquet tables and compare to the Spark parquet
dumps produced by `sbt "runMain graft.Verify <sfDir> <outDir>"`.

Usage: python3 tools/check.py [sfDir] [outDir] [--json summary.json]

--json writes a machine-readable per-query summary next to the console
output — the round-close gate record committed as CHECK_LOCAL_r{N}.json
so a failed driver-artifact pipeline cannot erase the round's
correctness evidence (the r10 CORRECTNESS file came back empty).
"""
import json
import math
import os
import sys

import duckdb

ARGS = list(sys.argv[1:])
JSON_OUT = None
if "--json" in ARGS:
    i = ARGS.index("--json")
    if i + 1 >= len(ARGS):
        sys.exit("usage: check.py [sfDir] [outDir] [--json summary.json]"
                 " (--json needs a path)")
    JSON_OUT = ARGS[i + 1]
    del ARGS[i:i + 2]
SF_DIR = ARGS[0] if len(ARGS) > 0 else "/root/testdata/sf0.01"
OUT_DIR = ARGS[1] if len(ARGS) > 1 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return round(float(v), 6)
    except ImportError:
        pass
    return v


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out


def main():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    with open(f"{OUT_DIR}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    summary = {}
    for name in sorted(oracles):
        sql = oracles[name]
        spark_dir = f"{OUT_DIR}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"MISSING  {name}: no spark output")
            summary[name] = "missing"
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
            want = con.execute(sql)
            want_cols = [d[0] for d in want.description]
            want_rows = want.fetchall()
        except Exception as e:
            print(f"ERROR    {name}: {e}")
            summary[name] = f"error: {str(e)[:120]}"
            n_fail += 1
            continue
        gc, gr = canon(got_cols, got_rows)
        wc, wr = canon(want_cols, want_rows)
        if gc != wc:
            print(f"SCHEMA   {name}: spark={gc} oracle={wc}")
            summary[name] = "schema-mismatch"
            n_fail += 1
        elif gr != wr:
            diff_g = [r for r in gr if r not in wr][:3]
            diff_w = [r for r in wr if r not in gr][:3]
            print(f"ROWS     {name}: spark={len(gr)} oracle={len(wr)}; "
                  f"spark-only={diff_g} oracle-only={diff_w}")
            summary[name] = "row-mismatch"
            n_fail += 1
        else:
            print(f"OK       {name}: {len(gr)} rows")
            summary[name] = "pass"
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    if JSON_OUT:
        with open(JSON_OUT, "w") as f:
            json.dump({"sf_dir": SF_DIR, "n_pass": n_pass, "n_fail": n_fail,
                       "queries": summary}, f, indent=1, sort_keys=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
