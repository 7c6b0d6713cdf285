"""Market-basket association rules: frequent item pairs with
support / confidence / lift over a (basket, item) relation.

Reference parity: no analogue in the reference (a file copier); this
is the co-occurrence-mining tier of corpus analytics (Agrawal &
Srikant VLDB'94 A-priori, restricted to the pair level — the level
that covers the classic retail/co-citation use and stays closed-form
for the oracle gate).

Scale design: pair candidates are generated per basket by a
self-equi-join ON THE BASKET KEY, so candidate volume is
sum_b |basket_b|^2 — bounded by the basket-size distribution, never
|items|^2 across baskets. A pathological mega-basket is the skew
lever: cap basket size upstream or drop ultra-frequent items first
(the A-priori monotonicity argument: an item below min-support can't
appear in a frequent pair). Counts are hash aggs; the basket total
rides in as a broadcast scalar so the whole operator stays one lazy
plan (no driver round-trip).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: float = 0.005,
    min_confidence: float = 0.1,
) -> DataFrame:
    """Directed pair rules (antecedent -> consequent) with
    support = n(a,b)/N, confidence = n(a,b)/n(a), and
    lift = confidence / (n(b)/N), where N = number of distinct
    baskets. Both directions of every frequent pair are emitted
    (confidence/lift denominators differ). All ratios are exact
    integer divisions in double — deterministic across engines.
    """
    b = baskets.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
    ).distinct()
    total = b.select(
        F.countDistinct("_b").alias("_n_total")
    )
    item_cnt = b.groupBy("_i").agg(F.count("*").alias("_n_item"))
    x, y = b.alias("x"), b.alias("y")
    pair_cnt = (
        x.join(
            y,
            (F.col("x._b") == F.col("y._b"))
            & (F.col("x._i") < F.col("y._i")),
        )
        .groupBy(
            F.col("x._i").alias("_ia"), F.col("y._i").alias("_ib")
        )
        .agg(F.count("*").alias("_n_pair"))
    )
    directed = pair_cnt.select(
        F.col("_ia").alias("antecedent"),
        F.col("_ib").alias("consequent"),
        "_n_pair",
    ).unionAll(
        pair_cnt.select(
            F.col("_ib").alias("antecedent"),
            F.col("_ia").alias("consequent"),
            "_n_pair",
        )
    )
    out = (
        directed.join(
            item_cnt.withColumnRenamed("_i", "antecedent")
            .withColumnRenamed("_n_item", "_n_a"),
            "antecedent",
        )
        .join(
            item_cnt.withColumnRenamed("_i", "consequent")
            .withColumnRenamed("_n_item", "_n_b"),
            "consequent",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "antecedent",
            "consequent",
            F.col("_n_pair").alias("pair_count"),
            (F.col("_n_pair") / F.col("_n_total")).alias("support"),
            (F.col("_n_pair") / F.col("_n_a")).alias("confidence"),
            (
                (F.col("_n_pair") / F.col("_n_a"))
                / (F.col("_n_b") / F.col("_n_total"))
            ).alias("lift"),
        )
        .filter(
            (F.col("support") >= F.lit(float(min_support)))
            & (F.col("confidence") >= F.lit(float(min_confidence)))
        )
    )
    return out
