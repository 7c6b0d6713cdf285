"""The declared, oracle-checked query surface (SURVEY.md §2b).

Each module registers queries into a shared registry: a Spark
implementation ``(spark, sf_dir) -> DataFrame`` and (where SQL can
express it) an equivalent DuckDB oracle SQL string. ``__spark_entry__``
exposes the merged registry to the driver.

Canonicalization rules (FIXTURES.md): every query has an explicit
ORDER BY on a deterministic key; floats are rounded (monetary sums to 2,
ratios/scores to 6) in BOTH implementations so driver-side hashing
cannot diverge on last-bit float noise; every computed column is aliased
identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, SparkQuery] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[SparkQuery], SparkQuery]:
    """Register a named query and (optionally) its DuckDB oracle SQL."""

    def deco(fn: SparkQuery) -> SparkQuery:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def small_sort(df: DataFrame, *cols) -> DataFrame:
    """Total-order sort for results that are provably small at ANY data
    scale (low-cardinality aggregates: group-by flag/status/nation,
    time-bounded windows, top-k output). Collapsing to one partition
    first lets Catalyst satisfy the sort's distribution requirement
    without the range-exchange sampling job a global ``orderBy`` runs —
    one task sorting hundreds of rows replaces a sample pass + shuffle.
    Never use on unbounded results (per-key rows that grow with data)."""
    return df.coalesce(1).sortWithinPartitions(*cols)


def load_all_queries() -> tuple[dict[str, SparkQuery], dict[str, str]]:
    """Import every query module (side-effect: registration) and return maps."""
    from distcpplus_spark.queries import (  # noqa: F401
        etl,
        llm,
        llm2,
        llm3,
        llm4,
        llm5,
        llm6,
        llm7,
        llm8,
        llm9,
        llm10,
        nonsql,
        relational,
        relational2,
        relational3,
        relational4,
        sketches,
        streaming,
    )

    return dict(QUERIES), dict(ORACLE)
