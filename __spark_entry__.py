"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``distcpplus_spark.queries``; this module just
exposes the registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_DIR)

from distcpplus_spark.queries import load_all_queries  # noqa: E402

_QUERIES, _ORACLE = load_all_queries()
_SHIPPED: set[int] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make ``distcpplus_spark`` importable on executor Python workers
    regardless of the driver's cwd/PYTHONPATH: closure-bearing queries
    (mapInPandas featurizers, RDD copy/listing functions) pickle
    module REFERENCES, so the workers must import the package. The
    driver process found it via the sys.path insert above; workers
    spawned from a different cwd would not — addPyFile ships a zip of
    the package once per SparkContext."""
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    import tempfile
    import zipfile

    zpath = os.path.join(
        tempfile.gettempdir(), f"distcpplus_spark_{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            pkg = os.path.join(_REPO_DIR, "distcpplus_spark")
            for root, _dirs, files in os.walk(pkg):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        z.write(full, os.path.relpath(full, _REPO_DIR))
    sc.addPyFile(zpath)
    _SHIPPED.add(key)


def _wrap(fn: Callable) -> Callable:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ship_package(spark)
        return fn(spark, sf_dir)

    run.__name__ = getattr(fn, "__name__", "query")
    run.__doc__ = fn.__doc__
    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 spine) on /root/testdata/sf0.001."""
    _ship_package(spark)
    return _QUERIES["q12_agg_q1"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _wrap(fn) for name, fn in _QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each hash-checkable query."""
    return dict(_ORACLE)
