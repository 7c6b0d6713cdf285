"""Local stand-in for the driver's correctness gate.

Runs every declared query through Spark AND its oracle SQL through
DuckDB at a given sf dir, canonicalizes both results (sort columns by
name, round floats, sort rows), and reports match/mismatch per query.

Usage: python tools/verify_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from distcpplus_spark.catalog import TABLES
from distcpplus_spark.queries import load_all_queries
from distcpplus_spark.session import get_spark

ROUND = 6


def canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, ROUND)
        if r == 0:
            r = 0.0
        return f"{r:.{ROUND}f}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        out.append("|".join(canon_cell(row[i]) for i in order))
    return sorted(out), [cols[i] for i in order]


def main() -> int:
    # --vanilla: run with a stock untuned SparkSession (exactly what
    # the driver harness does when importing __spark_entry__) instead
    # of the tuned factory — catches session-conf assumptions the
    # tuned path would mask.
    args = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv[1:]
    # --slice i/n: run the i-th (0-based) of n round-robin slices of
    # the sorted query list — lets long sweeps run as parallel chunks
    slice_i = slice_n = None
    for a in list(args):
        if a.startswith("--slice"):
            spec = a.split("=", 1)[1] if "=" in a else None
            if spec is None:
                idx = args.index(a)
                spec = args[idx + 1]
                args.remove(spec)
            slice_i, slice_n = (int(x) for x in spec.split("/"))
            args.remove(a)
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    queries, oracle = load_all_queries()
    if slice_n:
        names = sorted(queries)
        only = {n for i, n in enumerate(names) if i % slice_n == slice_i}

    con = duckdb.connect()
    # bound the oracle engine: a heavy DuckDB plan at sf3 can balloon
    # past the container's RAM (a 71 GB RSS OOM killed a sweep slice
    # mid-run on q315's shingle containment) — cap memory so it
    # SPILLS to disk instead, and keep the spill on the big volume
    con.execute("SET memory_limit='24GB'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    if vanilla:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[16]").getOrCreate()
    else:
        spark = get_spark("verify_oracle")
    n_pass = n_fail = n_err = 0
    for name in sorted(queries):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = queries[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            s_canon, s_cols = canon_rows(scols, srows)
        except Exception as e:
            print(f"ERR  {name}: spark failed: {type(e).__name__}: {e}")
            n_err += 1
            continue
        if name not in oracle:
            print(f"----  {name}: no oracle (rows-only), {len(srows)} rows "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracle[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            o_canon, o_cols = canon_rows(ocols, orows)
        except Exception as e:
            print(f"ERR  {name}: duckdb failed: {type(e).__name__}: {e}")
            n_err += 1
            continue
        dt = time.time() - t0
        if s_cols != o_cols:
            print(f"FAIL {name}: columns {s_cols} vs {o_cols} [{dt:.1f}s]")
            n_fail += 1
        elif len(s_canon) != len(o_canon):
            print(f"FAIL {name}: rowcount {len(s_canon)} vs {len(o_canon)} [{dt:.1f}s]")
            n_fail += 1
        elif s_canon != o_canon:
            diff = [
                (a, b) for a, b in zip(s_canon, o_canon) if a != b
            ][:3]
            print(f"FAIL {name}: value mismatch ({len(s_canon)} rows) "
                  f"first diffs: {diff} [{dt:.1f}s]")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(s_canon)} rows [{dt:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_err} error")
    return 1 if (n_fail or n_err) else 0


if __name__ == "__main__":
    raise SystemExit(main())
