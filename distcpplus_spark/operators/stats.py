"""Distribution-comparison statistics: exact two-sample
Kolmogorov-Smirnov over distributed data.

Reference parity: no analogue in the reference (a file copier); this
is the drift-monitoring tier of a training-data pipeline (did this
month's crawl shift the length/quality/score distribution?) beside
the PSI drift report (queries/llm5.py) — PSI needs pre-chosen bins,
KS is bin-free and exact.

Scale design: the statistic D = sup_x |F_a(x) - F_b(x)| needs the
joint ECDF, i.e. a GLOBAL running count over the sorted distinct
values — exactly the shape that must NOT be a partition-less window.
It runs as the repo's two-phase parallel prefix sum
(operators/scale.py::partitioned_running_aggs) over a caller-supplied
monotone bucket: per-bucket windows are fully parallel, only one
total row per bucket touches the driver. One hash agg (distinct
values) + one prefix-sum pass; the sup and argmax fold in a final
scalar aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    bucket: Column | None = None,
) -> DataFrame:
    """Exact two-sample KS statistic between the ``value_col``
    distributions of rows where ``group_col`` equals ``group_a`` vs
    ``group_b``.

    Returns ONE row: (d_stat, at_value, n_a, n_b, p_approx) where
    ``at_value`` is the smallest value attaining the supremum
    (deterministic tie-break) and ``p_approx`` is the asymptotic
    Smirnov tail bound ``2 * exp(-2 d² n_a n_b / (n_a + n_b))``.

    Ties (shared values, within or across samples) are exact: the
    ECDF is evaluated right-continuously at every distinct value
    after grouping, which is where sup|F_a - F_b| over all x is
    attained. ``bucket`` must be monotone non-decreasing in the
    value (default ``floor(value)``); coarse is fine — it only sets
    prefix-sum parallelism.
    """
    from distcpplus_spark.operators.scale import partitioned_running_aggs

    two = df.filter(F.col(group_col).isin([group_a, group_b])).select(
        F.col(value_col).alias("v"),
        F.when(F.col(group_col) == F.lit(group_a), 1)
        .otherwise(0)
        .alias("_is_a"),
    )
    per_value = two.groupBy("v").agg(
        F.sum("_is_a").alias("ca"),
        F.sum(1 - F.col("_is_a")).alias("cb"),
    )
    if bucket is None:
        bucket = F.floor(F.col("v"))
    cum = partitioned_running_aggs(
        per_value,
        ["v"],
        [("ca", "cum_a", "sum"), ("cb", "cum_b", "sum")],
        bucket,
    )
    totals = per_value.agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    diff = cum.crossJoin(F.broadcast(totals)).select(
        "v",
        "n_a",
        "n_b",
        F.abs(
            F.col("cum_a") / F.col("n_a") - F.col("cum_b") / F.col("n_b")
        ).alias("d"),
    )
    dmax = diff.agg(F.max("d").alias("d_stat"))
    return (
        diff.crossJoin(F.broadcast(dmax))
        .filter(F.col("d") == F.col("d_stat"))
        .groupBy("d_stat", "n_a", "n_b")
        .agg(F.min("v").alias("at_value"))
        .select(
            "d_stat",
            "at_value",
            "n_a",
            "n_b",
            F.least(
                F.lit(1.0),
                2.0
                * F.exp(
                    -2.0
                    * F.col("d_stat")
                    * F.col("d_stat")
                    * F.col("n_a")
                    * F.col("n_b")
                    / (F.col("n_a") + F.col("n_b"))
                ),
            ).alias("p_approx"),
        )
    )


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str,
) -> DataFrame:
    """Pareto skyline (minimize x, maximize y): the points no other
    point dominates, where a dominates b iff a.x <= b.x, a.y >= b.y
    and at least one inequality is strict. Exact duplicates of a
    skyline point are all kept (neither dominates the other).

    Distributed shape — the classic two-phase skyline: a LOCAL
    sort-based skyline per partition (sound: a point dominated within
    a partition is dominated globally), then the same pass over the
    union of local skylines in one task. Local skylines of random
    data are O(log n) points, so the final pass sees a tiny
    candidate set; the result is partitioning-independent because
    phase 1 only ever removes dominated points and phase 2 is exact.
    """
    import pandas as pd

    out_schema = df.select(id_col, x_col, y_col).schema

    def local(pdfs):
        # fold batches into ONE running skyline: a per-batch pass
        # would leak points dominated only across batch boundaries
        # (Arrow batch layout varies run to run — caught by the
        # sf0.1 sweep), and the running frontier stays small.
        import pandas as pd

        run = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            cur = pdf if run is None else pd.concat([run, pdf])
            run = _skyline_pass(cur, x_col, y_col)
        if run is not None:
            yield run

    cand = (
        df.select(id_col, x_col, y_col)
        .mapInPandas(local, out_schema)
    )
    final = cand.repartition(1).mapInPandas(local, out_schema)
    return final


def _skyline_pass(pdf, x_col: str, y_col: str):
    """One exact skyline scan over a pandas frame: per equal-x group
    keep only the max-y rows (ties all kept), then sweep x ascending
    keeping groups whose y strictly improves the running best."""
    g = pdf[pdf[y_col] == pdf.groupby(x_col)[y_col].transform("max")]
    g = g.sort_values([x_col, y_col])
    keep = []
    best = None
    for x, sub in g.groupby(x_col, sort=True):
        y = sub[y_col].iloc[0]
        if best is None or y > best:
            keep.append(sub)
            best = y
    import pandas as pd

    return pd.concat(keep) if keep else g.iloc[0:0]
