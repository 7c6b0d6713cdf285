"""Declarative data-quality constraint checking (deequ/dbt-test
style): declare constraints on a table, verify them all in as few
distributed passes as possible, get one violations row per
constraint.

Supported constraint kinds (each maps to a closed-form count, so the
whole report is oracle-checkable):
- not_null(col)          — rows with col IS NULL
- unique(col)            — rows beyond the first per duplicate value
- accepted_range(col, lo, hi) — rows outside [lo, hi]
- accepted_values(col, [..])  — rows with a value not in the list
- referential(col, other_df, other_col) — rows whose col has no
  match in the other frame (FK integrity)
- custom(name, predicate_col) — rows where the boolean predicate is
  FALSE

Scale shape: every row-local constraint (not_null / range / values /
custom) folds into ONE aggregation pass over the table —
conditional-sum columns, no shuffle beyond the final 1-row combine.
unique() adds one hash aggregation on its column; referential() adds
one anti join (broadcast when the dimension side is small). Nothing
collects more than a single summary row per constraint.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd  # module-top: pandas_udf type hints resolve here

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Check:
    name: str
    kind: str
    col: str | None = None
    lo: object = None
    hi: object = None
    values: list | None = None
    other: DataFrame | None = None
    other_col: str | None = None
    predicate: Column | None = field(default=None)


def not_null(col: str, name: str | None = None) -> Check:
    return Check(name or f"not_null({col})", "not_null", col=col)


def unique(col: str, name: str | None = None) -> Check:
    return Check(name or f"unique({col})", "unique", col=col)


def accepted_range(col: str, lo, hi, name: str | None = None) -> Check:
    return Check(
        name or f"range({col})", "accepted_range", col=col, lo=lo, hi=hi
    )


def accepted_values(col: str, values: list, name: str | None = None) -> Check:
    return Check(
        name or f"values({col})", "accepted_values", col=col,
        values=list(values),
    )


def referential(
    col: str, other: DataFrame, other_col: str, name: str | None = None
) -> Check:
    return Check(
        name or f"fk({col})", "referential", col=col, other=other,
        other_col=other_col,
    )


def custom(name: str, predicate: Column) -> Check:
    return Check(name, "custom", predicate=predicate)


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Verify all constraints; returns (check_name, n_violations,
    passed) with one row per constraint, in declaration order."""
    spark = df.sparkSession

    # --- fold all row-local checks into one aggregation pass ---
    local_aggs = []
    local_names = []
    for c in checks:
        if c.kind == "not_null":
            cond = F.col(c.col).isNull()
        elif c.kind == "accepted_range":
            cond = (
                F.col(c.col).isNull()
                | (F.col(c.col) < F.lit(c.lo))
                | (F.col(c.col) > F.lit(c.hi))
            )
        elif c.kind == "accepted_values":
            cond = ~F.col(c.col).isin(c.values) | F.col(c.col).isNull()
        elif c.kind == "custom":
            cond = ~F.coalesce(c.predicate, F.lit(False))
        else:
            continue
        local_aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(c.name)
        )
        local_names.append(c.name)

    counts: dict[str, int] = {}
    if local_aggs:
        row = df.agg(*local_aggs).collect()[0]
        counts.update({n: int(row[n] or 0) for n in local_names})

    for c in checks:
        if c.kind == "unique":
            # rows beyond the first per duplicate value (NULLs exempt,
            # matching SQL UNIQUE semantics)
            dup = (
                df.filter(F.col(c.col).isNotNull())
                .groupBy(c.col)
                .agg(F.count("*").alias("_n"))
                .filter(F.col("_n") > 1)
                .agg(F.sum(F.col("_n") - 1).alias("_v"))
                .collect()[0]["_v"]
            )
            counts[c.name] = int(dup or 0)
        elif c.kind == "referential":
            orphans = (
                df.filter(F.col(c.col).isNotNull())
                .join(
                    c.other.select(
                        F.col(c.other_col).alias(c.col)
                    ).distinct(),
                    c.col,
                    "left_anti",
                )
                .count()
            )
            counts[c.name] = int(orphans)

    rows = [
        (c.name, counts.get(c.name, 0), counts.get(c.name, 0) == 0)
        for c in checks
    ]
    # one-slice local relation: createDataFrame(list) slices by
    # defaultParallelism and a downstream coalesce(1)/small_sort then
    # evaluates every slice serially at a Python round trip each
    # (~150 ms x 32 x 2 tables ≈ 10 s of the old q186 wall)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, numSlices=1),
        "check_name STRING, n_violations BIGINT, passed BOOLEAN",
    )


def repair_mojibake(col: Column) -> Column:
    """Repair double-encoded UTF-8 ('mojibake': UTF-8 bytes that were
    mis-decoded as cp1252/latin-1 and re-encoded, the single most
    common web-corpus text corruption — 'café' shipped as 'cafÃ©').
    The reversal is deterministic: re-encode via cp1252 (latin-1 for
    the 0x81-class holes cp1252 leaves undefined) and decode as
    UTF-8; if that fails the text was not mojibake and passes
    through unchanged. One round only — iterating can over-correct
    legitimate text, the documented conservative policy of public
    fixers.

    Pandas UDF (Arrow-batched): python's codec machinery is the
    right tool here and this runs only on the ingest/cleanup path,
    not in analytical hot loops."""

    @F.pandas_udf("string")
    def fix(s: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return None
            try:
                raw = t.encode("cp1252")
            except UnicodeEncodeError:
                try:
                    raw = t.encode("latin-1")
                except UnicodeEncodeError:
                    return t
            try:
                return raw.decode("utf-8")
            except UnicodeDecodeError:
                return t

        return s.map(one)

    return fix(col)
