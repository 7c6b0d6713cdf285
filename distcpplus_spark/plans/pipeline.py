"""Declarative corpus-pipeline runner: a version-controllable spec
(list of stages) compiled onto the engine's own operators, with
per-stage row lineage — the orchestration layer a training-data team
actually runs between raw ingestion and shard export.

Spec shape:
    {"stages": [
        {"op": "filter_rules", "rules": [...build_filter_pipeline spec]},
        {"op": "exact_dedup", "id_col": ..., "text_col": ...},
        {"op": "mixture_budget", "group_col": ..., "size_col": ...,
         "weights": [(group, wt), ...], "frac": 0.3},
        {"op": "hash_split", "id_col": ..., "keep": "train"|"test",
         "mod": 10},
    ]}

Lineage counts run one action per stage boundary — at fixture scale
that is the obviously-right observability trade; at 100 TB pass
``count_stages=False`` and read the counts from ``observe()`` metrics
on the single final action instead (each stage here attaches nothing
that would prevent that), or persist the frame at the one boundary
you re-reference. The runner itself never collects data rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from distcpplus_spark.operators.dedup import build_filter_pipeline, exact_dedup

_MIXER_A = 2654435761
_MIXER_B = 1013904223


def mixture_token_budget(
    df: DataFrame,
    group_col: str,
    size_col: str,
    id_col: str,
    weights: list[tuple[str, float]],
    frac: float,
) -> DataFrame:
    """Deterministic mixture sampling to a token budget (see
    q250_mixture_token_budget for the full scale rationale): order
    each group by a mixer priority, keep rows while the running
    size prefix-sum is under ``frac * corpus_total * weight``.
    Groups absent from ``weights`` are dropped (weight 0)."""
    spark = df.sparkSession
    total = df.agg(F.sum(size_col)).collect()[0][0]
    wdf = spark.createDataFrame(list(weights), f"{group_col} string, wt double")
    budg = wdf.select(
        group_col,
        F.floor(F.lit(float(total)) * F.col("wt") * F.lit(frac))
        .cast("bigint")
        .alias("_budget"),
    )
    pri = (F.col(id_col) * F.lit(_MIXER_A) + F.lit(_MIXER_B)) % F.lit(1000000)
    win = Window.partitionBy(group_col).orderBy("_pri", id_col)
    cum = df.withColumn("_pri", pri).withColumn(
        "_cum", F.sum(size_col).over(win)
    )
    return (
        cum.join(F.broadcast(budg), group_col)
        .filter(F.col("_cum") - F.col(size_col) < F.col("_budget"))
        .drop("_pri", "_cum", "_budget")
    )


def hash_split(
    df: DataFrame, id_col: str, keep: str = "train", mod: int = 10
) -> DataFrame:
    """Deterministic train/test split: mixer(id) % mod == 0 is the
    test slice (1/mod of rows in expectation), everything else
    train. Engine-portable — the same arithmetic splits identically
    in any system, which is what makes held-out sets durable."""
    mix = (F.col(id_col) * F.lit(_MIXER_A) + F.lit(_MIXER_B)) % F.lit(mod)
    if keep == "train":
        return df.filter(mix != 0)
    if keep == "test":
        return df.filter(mix == 0)
    raise ValueError(f"keep must be 'train' or 'test', got {keep!r}")


def leakage_safe_split(
    df, id_col: str, edges, mod: int = 10
):
    """Group-aware train/test split: rows connected by ``edges``
    (near-duplicate pairs, same-source links — any relation that
    makes two rows 'the same knowledge') land in the SAME split,
    because the split hash is taken on the CONNECTED COMPONENT
    representative, not the row id. Splitting near-duplicates across
    train and test is the classic eval-contamination bug — the held
    -out metric silently measures memorization.

    ``edges`` is a DataFrame (id_a, id_b). Returns df plus:
    split_group (min id of the component; the row's own id for
    singletons), group_docs (component size), split ('test' when
    mixer(split_group) % mod == 0, else 'train').

    Scale: components via pointer-doubling label propagation
    (O(log diameter) rounds over the EDGE set only — singletons
    never enter the iteration), one left join to attach labels, one
    hash agg for sizes. The split itself stays a row-local hash, so
    adding documents never reshuffles old assignments — exactly the
    durability argument of hash_split, lifted to groups."""
    from distcpplus_spark.operators.dedup import union_find_components

    labels = union_find_components(edges)
    assigned = (
        df.join(labels, df[id_col] == labels.node, "left")
        .withColumn("split_group", F.coalesce("component", F.col(id_col)))
        .drop("node", "component")
    )
    sizes = assigned.groupBy("split_group").agg(
        F.count("*").alias("group_docs")
    )
    mix = (F.col("split_group") * F.lit(_MIXER_A) + F.lit(_MIXER_B)) % F.lit(
        mod
    )
    return assigned.join(sizes, "split_group").withColumn(
        "split", F.when(mix == 0, F.lit("test")).otherwise(F.lit("train"))
    )


def run_pipeline(
    df: DataFrame, spec: dict, count_stages: bool = True
) -> tuple[DataFrame, list[tuple]]:
    """Run the staged spec over ``df``. Returns (final_frame,
    lineage) where lineage rows are (stage, op, rows_in, rows_out)
    — the shrink funnel that makes a config change reviewable
    (pair with filter_rejection_audit for the per-rule view)."""
    lineage: list[tuple] = []
    cur = df
    prev_count = df.count() if count_stages else None
    for i, st in enumerate(spec["stages"], 1):
        op = st["op"]
        if op == "filter_rules":
            pred, _desc = build_filter_pipeline(st["rules"])
            cur = cur.filter(pred)
        elif op == "exact_dedup":
            cur = exact_dedup(cur, st["text_col"], st["id_col"])
        elif op == "near_dedup":
            from distcpplus_spark.operators.dedup import minhash_lsh_dedup

            cur = minhash_lsh_dedup(
                cur,
                st["text_col"],
                st["id_col"],
                threshold=st.get("threshold", 0.5),
                num_hashes=st.get("num_hashes", 4),
                bands=st.get("bands", 4),
                shingle_k=st.get("shingle_k", 8),
                portable=True,
            )
        elif op == "mixture_budget":
            cur = mixture_token_budget(
                cur,
                st["group_col"],
                st["size_col"],
                st["id_col"],
                st["weights"],
                st["frac"],
            )
        elif op == "hash_split":
            cur = hash_split(
                cur, st["id_col"], st.get("keep", "train"), st.get("mod", 10)
            )
        else:
            raise ValueError(f"unknown pipeline op {op!r}")
        if count_stages:
            n = cur.count()
            lineage.append((i, op, prev_count, n))
            prev_count = n
        else:
            lineage.append((i, op, None, None))
    return cur, lineage


def temperature_allocation(
    counts: DataFrame,
    group_col: str,
    n_col: str,
    budget: int,
    temperature: float = 2.0,
) -> DataFrame:
    """Temperature-flattened sampling allocation (the mC4/ROOTS
    multilingual mixing move): domain d with n_d examples gets budget
    share proportional to n_d^(1/T) — T=1 is natural proportions,
    T→∞ is uniform — integerized by largest remainder so the
    allocations sum EXACTLY to ``budget``.

    Exactness discipline (cross-engine hash-portable): the only
    irrational step, n^(1/T), is quantized to integer micro-weights
    w = floor(n^(1/T) * 1e6 + 0.5) — for T=2 that's sqrt(), which
    IEEE 754 requires correctly rounded, so both engines compute the
    SAME double and the same w. Everything after is BIGINT
    arithmetic: S = sum(w), base = (budget*w) div S, remainder
    r = budget*w - base*S, and the (budget - sum(base)) largest
    remainders (ties broken by group name) get +1. The remainder
    rank is a self-join count over the per-group aggregate — #groups
    rows, never a global window.

    Returns (group, n, alloc). Scale: one groupBy to counts (caller
    often has it already), then #groups^2 trivial arithmetic.
    """
    if temperature <= 0:
        raise ValueError("temperature must be positive")
    inv_t = 1.0 / float(temperature)
    w = counts.select(
        F.col(group_col).alias("g"),
        F.col(n_col).cast("long").alias("n"),
        F.floor(
            F.pow(F.col(n_col).cast("double"), F.lit(inv_t)) * 1e6
            + F.lit(0.5)
        ).cast("long").alias("w"),
    )
    tot = w.agg(F.sum("w").alias("s"), F.count("*").alias("k"))
    b = F.lit(int(budget))
    base = (
        w.crossJoin(F.broadcast(tot))
        .withColumn("alloc0", F.expr(f"({int(budget)} * w) div s"))
        .withColumn("rem", b * F.col("w") - F.col("alloc0") * F.col("s"))
    )
    # deficit = budget - sum(base): give +1 to the deficit-many
    # largest remainders; rank via a self-join count on the tiny
    # per-group aggregate (no global window)
    others = base.select(
        F.col("g").alias("g2"), F.col("rem").alias("rem2")
    )
    ranked = (
        base.join(
            F.broadcast(others),
            (F.col("rem2") > F.col("rem"))
            | ((F.col("rem2") == F.col("rem")) & (F.col("g2") < F.col("g"))),
            "left",
        )
        .groupBy("g", "n", "alloc0", "rem")
        .agg(F.count("g2").alias("n_before"))
    )
    total_base = base.agg(F.sum("alloc0").alias("tb"))
    return (
        ranked.crossJoin(F.broadcast(total_base))
        .select(
            F.col("g").alias(group_col),
            F.col("n"),
            (
                F.col("alloc0")
                + F.when(
                    F.col("n_before") < b - F.col("tb"), F.lit(1)
                ).otherwise(F.lit(0))
            ).cast("long").alias("alloc"),
        )
    )
