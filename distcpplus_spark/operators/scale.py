"""Scale-out join strategies: skew salting and bucketed co-location.

These are the two levers the built-in planner cannot apply on its own:

* **Salting** rewrites a skewed equi-join so one hot key's rows spread
  over N reducers instead of hot-spotting one. AQE's skew-join handles
  skew *within* sort-merge joins after a shuffle exists; salting is for
  the aggregation-side variant and for engines/versions where AQE can't
  split (e.g. a skewed ``groupBy``).
* **Bucketing** persists a table pre-hash-partitioned on its join key so
  repeated joins/aggregations on that key run with ZERO shuffle — the
  pattern for a 100 TB fact table joined every day on the same key.

Reference parity note: the reference's only partitioning strategy is
size-balanced bin-packing of a copy manifest (CopyInputFormat.java:33-79,
mapped in plans/copy_plan.py::assign_cost_buckets). Salting/bucketing are
the analytics-engine generalization of the same idea: choose the
partitioning function from data statistics, not row order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__dcp_salt"


def salted_join(
    facts: DataFrame,
    dims: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-mitigated equi-join of a big skewed ``facts`` side against a
    smaller ``dims`` side.

    The fact side gets a deterministic salt in ``[0, salt_buckets)``
    derived from a hash of the whole row, appended to the join key; the
    dim side is exploded ``salt_buckets``-fold so every (key, salt)
    combination still matches. A key holding 30% of all rows now lands
    on ``salt_buckets`` reducers instead of one.

    Cost model: dims shuffle volume multiplies by ``salt_buckets`` —
    use only when |dims| * salt_buckets << |facts|, i.e. exactly the
    skewed-fact/small-dim shape. Only ``inner`` and ``left`` (fact-
    preserving) joins are supported: duplicating the dim side would
    corrupt right/full semantics.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)

    salt = F.pmod(F.hash(*[F.col(c) for c in facts.columns]), F.lit(salt_buckets))
    f = facts.withColumn(SALT_COL, salt)
    d = dims.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    return f.join(d, keys + [SALT_COL], how).drop(SALT_COL)


def salted_group_count(
    df: DataFrame, key: str, salt_buckets: int = 16
) -> DataFrame:
    """Two-phase aggregation for a skewed ``groupBy(key).count()``:
    partial-aggregate on (key, salt), then combine per key. The second
    shuffle moves at most ``salt_buckets`` rows per key no matter how
    hot the key is. Generalizes to any commutative aggregate.
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    partial = (
        df.withColumn(SALT_COL, salt)
        .groupBy(key, SALT_COL)
        .agg(F.count("*").alias("__partial_n"))
    )
    return partial.groupBy(key).agg(F.sum("__partial_n").alias("n"))


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str | list[str],
    num_buckets: int,
    path: str | None = None,
    sort_key: str | list[str] | None = None,
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) on its join
    key. Subsequent equi-joins/aggregations between tables bucketed the
    same way on the same key read co-located buckets and skip the
    shuffle entirely — the plan shows SortMergeJoin with no Exchange.

    ``path`` makes it an external table (data at ``path``, metadata in
    the session catalog); omit for a managed table in the warehouse dir.
    """
    keys = [bucket_key] if isinstance(bucket_key, str) else list(bucket_key)
    writer = df.write.mode("overwrite").format("parquet")
    if path is not None:
        writer = writer.option("path", path)
    writer = writer.bucketBy(num_buckets, *keys)
    if sort_key is not None:
        sorts = [sort_key] if isinstance(sort_key, str) else list(sort_key)
        writer = writer.sortBy(*sorts)
    writer.saveAsTable(table)


def hinted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    strategy: str,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with an explicit strategy override: 'broadcast',
    'merge' (sort-merge), 'shuffle_hash', or 'shuffle_replicate_nl'.

    Catalyst's size-estimate-driven choice is right ~always; the
    override exists for the cases statistics get wrong at 100 TB —
    e.g. a filtered dimension whose post-filter size the optimizer
    can't see (broadcast it anyway), or a medium⋈medium join where
    sort-merge's sort dominates and shuffle-hash wins. The hint is
    advisory on the RIGHT side; Spark ignores it when invalid for the
    join type, never fails.
    """
    valid = {"broadcast", "merge", "shuffle_hash", "shuffle_replicate_nl"}
    if strategy not in valid:
        raise ValueError(f"strategy must be one of {sorted(valid)}")
    return left.join(right.hint(strategy), on, how)
