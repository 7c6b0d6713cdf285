"""Incremental aggregate maintenance — materialized-view delta
updates without rescanning the base data.

A grouped aggregate over an append-only 100 TB fact table should not
be recomputed from scratch when a day's partition lands: keep the
aggregate STATE (per-key mergeable partials — sum, count, min, max;
avg derives as sum/count at read time), aggregate only the delta,
and merge states. Merging is a union of two state frames plus one
re-aggregation over (typically) |keys| rows — the cost scales with
the delta and the key cardinality, never with the base table.

Every supported aggregate is a commutative monoid, which is exactly
the property that makes map-side partial aggregation work inside
Spark itself — this module just persists that intermediate state
across jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KINDS = ("sum", "count", "min", "max")


def agg_state(
    df: DataFrame, keys: list[str], specs: list[tuple[str, str]]
) -> DataFrame:
    """Build the mergeable state: one row per key group with a
    ``<kind>_<col>`` column per (kind, col) spec. ``count`` counts
    non-null values of its column (SQL COUNT(col) semantics)."""
    aggs = []
    for kind, col in specs:
        if kind not in _KINDS:
            raise ValueError(f"unsupported aggregate kind {kind!r}")
        fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}[
            kind
        ]
        aggs.append(fn(col).alias(f"{kind}_{col}"))
    return df.groupBy(*keys).agg(*aggs)


def merge_states(
    a: DataFrame, b: DataFrame, keys: list[str],
    specs: list[tuple[str, str]],
) -> DataFrame:
    """Merge two state frames: sums and counts add, mins take min,
    maxes take max — keys present in only one side pass through."""
    merged = a.unionByName(b)
    aggs = []
    for kind, col in specs:
        name = f"{kind}_{col}"
        outer = {
            "sum": F.sum, "count": F.sum, "min": F.min, "max": F.max
        }[kind]
        aggs.append(outer(name).alias(name))
    return merged.groupBy(*keys).agg(*aggs)
