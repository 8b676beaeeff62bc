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
    if isinstance(v, dict):
        # STRUCT/MAP values come back as dicts - normalize to a sorted
        # item tuple so rows stay hashable for the mismatch set-diff
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
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


_CON = None


def _worker_init(db_threads=None):
    # one connection per worker process, created after fork
    global _CON
    _CON = duckdb.connect()
    _CON.execute("SET TimeZone='UTC'")
    # bound per-worker parallelism ONLY when fanning out: 8 workers x
    # all-cores DuckDB oversubscribes a 32-thread box and the fan-out
    # loses to itself; the serial path keeps DuckDB's own default
    if db_threads is None:
        db_threads = os.environ.get("CHECK_DB_THREADS")
    if db_threads is not None:
        _CON.execute(f"SET threads={int(db_threads)}")
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            _CON.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")


def check_one(item):
    """(name, sql) -> (name, line, status). Pure per-query check: same
    norm/canon semantics as the serial loop ever had — parallelism only
    changes the wall, not the verdict."""
    name, sql = item
    spark_dir = f"{OUT_DIR}/{name}"
    if not os.path.isdir(spark_dir):
        return name, f"MISSING  {name}: no spark output", "missing"
    try:
        got = _CON.execute(
            f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
        got_cols = [d[0] for d in got.description]
        got_rows = got.fetchall()
        want = _CON.execute(sql)
        want_cols = [d[0] for d in want.description]
        want_rows = want.fetchall()
    except Exception as e:
        return name, f"ERROR    {name}: {e}", f"error: {str(e)[:120]}"
    gc, gr = canon(got_cols, got_rows)
    wc, wr = canon(want_cols, want_rows)
    if gc != wc:
        return (name, f"SCHEMA   {name}: spark={gc} oracle={wc}",
                "schema-mismatch")
    if gr != wr:
        gs, ws = set(gr), set(wr)
        diff_g = [r for r in gr if r not in ws][:3]
        diff_w = [r for r in wr if r not in gs][:3]
        return (name,
                f"ROWS     {name}: spark={len(gr)} oracle={len(wr)}; "
                f"spark-only={diff_g} oracle-only={diff_w}",
                "row-mismatch")
    return name, f"OK       {name}: {len(gr)} rows", "pass"


def main():
    with open(f"{OUT_DIR}/oracle_sql.json") as f:
        oracles = json.load(f)

    items = sorted(oracles.items())
    workers = int(os.environ.get("CHECK_WORKERS",
                                 str(min(8, os.cpu_count() or 1))))
    n_pass = n_fail = 0
    summary = {}

    def consume(results):
        nonlocal n_pass, n_fail
        # imap streams results in input order as they complete, so a
        # stuck oracle shows every already-finished query first
        for name, line, status in results:
            print(line, flush=True)
            summary[name] = status
            if status == "pass":
                n_pass += 1
            else:
                n_fail += 1

    # fork-only pool: spawn would re-import this module per worker and
    # re-parse argv; on platforms without fork (Windows) fall back to
    # the serial path rather than raising out of mp.get_context.
    import multiprocessing as mp
    try:
        fork_ctx = mp.get_context("fork")
    except ValueError:
        fork_ctx = None
    if fork_ctx is not None and workers > 1 and len(items) > 1:
        db_threads = os.environ.get(
            "CHECK_DB_THREADS", str(max(1, (os.cpu_count() or 8) // workers)))
        with fork_ctx.Pool(
                workers, initializer=_worker_init,
                initargs=(db_threads,)) as pool:
            consume(pool.imap(check_one, items, chunksize=1))
    else:
        _worker_init()
        consume(check_one(it) for it in items)

    print(f"\n{n_pass} pass, {n_fail} fail")
    if JSON_OUT:
        with open(JSON_OUT, "w") as f:
            json.dump({"sf_dir": SF_DIR, "n_pass": n_pass, "n_fail": n_fail,
                       "queries": summary}, f, indent=1, sort_keys=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
